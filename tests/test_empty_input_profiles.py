"""Empty-input behavior of the column-profiling queries (q136/q197).

Both queries compute their non-null row counts as a SUM over a per-value
histogram; on an EMPTY table that SUM is NULL where the DuckDB oracles'
count(col) is 0. The queries coalesce the sum to 0 — these tests pin
that against a zero-row copy of the fixtures so an sf-dir with an empty
table still hash-matches the oracle (reference parity: the reference's
profiling paths emit 0-counts on empty frames too).
"""
from __future__ import annotations

import os

import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """Zero-row copies of the tables q136/q197 read, exact same schemas."""
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for t in ("lineitem", "documents", "orders"):
        spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).limit(0).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"{t}.parquet"))
    return d


def test_q136_profiles_empty_table_as_zero_counts(spark, empty_sf_dir):
    from pandaspark.queries import REGISTRY

    rows = {
        r["col_name"]: r
        for r in REGISTRY["q136_column_profile"].fn(spark, empty_sf_dir).collect()
    }
    assert set(rows) == {"l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate"}
    for r in rows.values():
        # count(col) semantics on empty input: 0, never NULL
        assert r["n_nonnull"] == 0
        assert r["n_distinct"] == 0
        assert r["min_val"] is None and r["max_val"] is None


def test_q197_prices_empty_tables_as_zero_counts(spark, empty_sf_dir):
    from pandaspark.queries import REGISTRY

    rows = REGISTRY["q197_encoding_advisor"].fn(spark, empty_sf_dir).collect()
    assert len(rows) == 6
    for r in rows:
        assert r["n_values"] == 0
        assert r["ndv"] == 0
        # byte sums stay NULL on empty input on BOTH engines (sum over
        # zero rows), so dict/plain pricing and the verdict are NULL too
        assert r["plain_bytes"] is None
        assert r["dict_bytes"] is None
        assert r["use_dict"] is None
