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

import pytest

from make_scaled import doc_perm, scale  # noqa: E402

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


def test_doc_perm_injective_to_the_state_bound():
    # every copy index up to the asserted generator bound must get a
    # DISTINCT letter permutation — the K=100 build caught two broken
    # third axes (digit rotation; +7·(c//95) consonant offset) that each
    # left 24,960 cross-copy clone texts, so the property is pinned here
    perms = [doc_perm(c)[1] for c in range(126)]
    assert len(set(perms)) == len(perms)
    # each target must be a PERMUTATION of the source (translate must not
    # merge letters, or distinct base texts could collide)
    src = doc_perm(0)[0]
    for t in perms:
        assert sorted(t) == sorted(src)


def test_scale_rejects_k_past_state_space(spark, tmp_path):
    with pytest.raises(ValueError, match="perturbation state space"):
        scale(spark, SF_DIR, str(tmp_path / "too-big"), 127)


def test_hot_frac_plants_the_hot_key(spark, tmp_path):
    dst = str(tmp_path / "k2hot")
    scale(spark, SF_DIR, dst, 2, hot_frac=0.25)
    base_li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    li = spark.read.parquet(f"{dst}/lineitem.parquet")
    n = li.count()
    hot = li.filter(F.col("l_suppkey") == 0).count()
    # deterministic row-hash selection remaps ~25%; rows already at the
    # hot key in copy 0 stay there (sf0.001 has few suppliers, so the
    # natural suppkey-0 share is a few percent, not 1/1000)
    base0 = base_li.filter(F.col("l_suppkey") == 0).count() / base_li.count()
    want = 0.25 + 0.75 * base0 / 2  # copy 1's keys are offset: only copy 0 adds
    assert abs(hot / n - want) < 0.02
    ev = spark.read.parquet(f"{dst}/events.parquet")
    base_ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev0 = base_ev.filter(F.col("user_id") == 0).count() / base_ev.count()
    hot_ev = ev.filter(F.col("user_id") == 0).count()
    assert abs(hot_ev / ev.count() - (0.25 + 0.75 * ev0 / 2)) < 0.02
    # row counts untouched
    assert n == 2 * base_li.count()


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
