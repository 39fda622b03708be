"""Mirror of the driver's correctness gate: every registered query runs on
Spark AND its DuckDB oracle; row-count, column names, type categories, and
an order-insensitive value-hash must match exactly.

Run at sf0.001 by default (fast); set PANDASPARK_TEST_SF_DIR=/root/testdata/sf0.01
for the driver's exact scale.
"""

from __future__ import annotations

import hashlib
import math

import pyarrow as pa
import pytest

from pandaspark.queries import REGISTRY

from .conftest import SF_DIR


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _hash_lines(rows_by_name, colnames) -> list[str]:
    cols = sorted(colnames)
    return sorted("|".join(_norm_cell(r[c]) for c in cols) for r in rows_by_name)


def _spark_category(dt: str) -> str:
    dt = dt.lower()
    if dt in ("tinyint", "smallint", "int", "bigint", "long", "integer"):
        return "int"
    if dt in ("float", "double") or dt.startswith("decimal"):
        return "float"
    if dt == "boolean":
        return "bool"
    if dt == "date":
        return "date"
    if dt.startswith("timestamp"):
        return "timestamp"
    if dt.startswith("array"):
        return "list"
    return "str"


def _arrow_category(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t) or pa.types.is_decimal(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    return "str"


ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, ddb, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR)
    srows = [r.asDict() for r in sdf.collect()]
    scats = {f.name: _spark_category(f.dataType.simpleString()) for f in sdf.schema.fields}

    tbl = ddb.execute(spec.oracle).arrow()
    drows = tbl.to_pylist()
    dcats = {n_: _arrow_category(t) for n_, t in zip(tbl.column_names, tbl.schema.types)}

    assert sorted(scats) == sorted(dcats), f"{name}: column names differ"
    assert scats == dcats, f"{name}: type categories differ: {scats} vs {dcats}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs oracle {len(drows)}"
    s_lines = _hash_lines(srows, list(scats))
    d_lines = _hash_lines(drows, list(dcats))
    if hashlib.sha256("\n".join(s_lines).encode()).digest() != hashlib.sha256(
        "\n".join(d_lines).encode()
    ).digest():
        diff = [(a, b) for a, b in zip(s_lines, d_lines) if a != b][:5]
        raise AssertionError(f"{name}: value hash mismatch; first diffs: {diff}")


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR)
    assert sdf.count() >= 0
