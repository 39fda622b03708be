"""The synthetic scale-up generator must not manufacture clones: every
copy's content perturbation has to stay distinct past the old period-5
vowel rotation (documents) and period-16 roll+sign (embeddings), or the
dedup/LSH/ANN scaling measurements exercise clone handling instead of
corpus growth (docs/SCALING.md, 25× section)."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from make_scaled import scale  # noqa: E402

from .conftest import SF_DIR


def test_k7_set_has_no_cross_copy_clones(spark, tmp_path):
    # K=7 crosses the old vowel-rotation period (5) where copies 5/6
    # collided with 0/1; keep it small so the test stays cheap
    dst = str(tmp_path / "k7")
    scale(spark, SF_DIR, dst, 7)

    docs = spark.read.parquet(f"{dst}/documents.parquet")
    base_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_base = base_docs.count()
    base_dup_rows = n_base - base_docs.select("text").distinct().count()
    dup_rows = docs.count() - docs.select("text").distinct().count()
    # inherited duplicates replicate 7x; the generator must add none
    assert docs.count() == 7 * n_base
    assert dup_rows == 7 * base_dup_rows

    emb = spark.read.parquet(f"{dst}/embeddings.parquet")
    n_emb = emb.count()
    distinct_vecs = emb.select(
        F.col("embedding").cast("array<double>").alias("e")
    ).distinct().count()
    assert distinct_vecs == n_emb  # base vectors are unique; copies must stay so

    # keys must not collide across copies (join consistency)
    assert emb.select("vec_id").distinct().count() == n_emb


def test_copies_below_5_match_published_scheme(spark, tmp_path):
    # the K<=5 sets behind the published 5x table must stay byte-identical:
    # copy c<5 applies ONLY the vowel rotation, no consonant shift
    dst = str(tmp_path / "k2")
    scale(spark, SF_DIR, dst, 2)
    docs = spark.read.parquet(f"{dst}/documents.parquet")
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    stride = 100_000_000
    copy1 = docs.filter(F.col("doc_id") >= stride).select(
        (F.col("doc_id") - stride).alias("doc_id"), F.col("text").alias("got")
    )
    expect = base.select(
        "doc_id", F.translate("text", "aeiou", "eioua").alias("want")
    )
    diff = copy1.join(expect, "doc_id").filter(
        ~F.col("got").eqNullSafe(F.col("want"))
    )
    assert diff.count() == 0
