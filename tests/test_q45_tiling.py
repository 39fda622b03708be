"""q45's block-pair kernel evaluates the cosine matrix in fixed-size tiles
(bounded per-task memory at any block size — the 100× scale step OOMed the
un-tiled form, whose transient matrix was quadratic in the block size).
Tiling must be result-invariant: shrink the tile far below the fixture
block size and the emitted pair set must be identical."""

from __future__ import annotations

from pandaspark.queries import REGISTRY, similarity

from .conftest import SF_DIR


def _pairs(spark):
    df = REGISTRY["q45_cosine_neardup"].fn(spark, SF_DIR)
    return sorted(tuple(r) for r in df.collect())


def test_q45_tile_boundary_invariance(spark, monkeypatch):
    base = _pairs(spark)
    assert base, "fixture must contain near-dup pairs or the test is vacuous"
    monkeypatch.setattr(similarity, "_Q45_TILE", 7)
    assert _pairs(spark) == base
