"""The Arrow-vectorized cosine top-k must return EXACTLY the same rows as
the JVM-expression baseline q40 (same rounding, same tie-break)."""

from __future__ import annotations

from pandaspark.queries import REGISTRY, load
from pandaspark.vectorops import cosine_topk_arrow, load_query_vectors

from .conftest import SF_DIR


def test_arrow_topk_equals_jvm_topk(spark):
    want = {
        (r.qid, r.rk): (r.vec_id, r.cosine)
        for r in REGISTRY["q40_cosine_topk"].fn(spark, SF_DIR).collect()
    }
    base = load(spark, SF_DIR, "embeddings")
    got = {
        (r.qid, r.rk): (r.vec_id, r.cosine)
        for r in cosine_topk_arrow(base, load_query_vectors(spark, SF_DIR), k=5).collect()
    }
    assert got == want and len(got) == 25
