"""q198 zero-candidate edge: Spark's row set must match the oracle's.

The oracle derives its per-nprobe rows from `cand` (actual candidate
rows), while the Spark side counts through the probe ranking. On a
degenerate corpus where every query's top-1 probed cell is its own
singleton (one-hot vectors, one label per vector), nprobe=1 scans ZERO
candidates — the oracle emits no row for it, and q198 must drop its
probe-derived n_scanned=0 row too (pipeline18.py filter). This is the
round-8 advisory's exact failure fixture, run through the full
driver-style compare.
"""
from __future__ import annotations

import math
import os

import duckdb
import pytest

from pandaspark.queries import REGISTRY


@pytest.fixture(scope="module")
def degenerate_dir(spark, tmp_path_factory):
    """5 one-hot 64-dim vectors, each alone in its own label/cell."""
    d = str(tmp_path_factory.mktemp("deg_ivf"))
    rows = [
        (i, [1.0 if j == i else 0.0 for j in range(64)], i) for i in range(5)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "embeddings.parquet")
    )
    return d


def _norm(v):
    if v is None:
        return "\x00"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    return str(v)


def test_q198_drops_zero_candidate_probe_levels(spark, degenerate_dir):
    spec = REGISTRY["q198_ivf_multiprobe_curve"]
    sdf = spec.fn(spark, degenerate_dir)
    srows = sdf.collect()
    # nprobe=1 scans only each query's own singleton cell -> no candidates
    assert {r["nprobe"] for r in srows} == {2, 3}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{os.path.join(degenerate_dir, 'embeddings.parquet')}/*.parquet'"
    )
    ores = con.execute(spec.oracle).fetchall()
    ocols = [c[0] for c in con.description]
    con.close()

    cols = sdf.columns
    key = lambda names, row: "|".join(
        _norm(row[i]) for i in sorted(range(len(names)), key=lambda j: names[j])
    )
    assert sorted(cols) == sorted(ocols)
    assert sorted(key(cols, tuple(r)) for r in srows) == sorted(
        key(ocols, r) for r in ores
    )
