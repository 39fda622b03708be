"""Declarative data-quality expectations, compiled into ONE aggregate pass.

The Deequ/Great-Expectations capability re-expressed Spark-first: a check
suite is a list of small declarative specs; `compile_suite` turns the
whole suite into a single `agg()` over conditional-count expressions, so
N checks over a 100 TB table cost one scan with map-side partials — never
one job per check. The wide one-row result is exploded back into a tidy
(check_name, col_name, n_rows, n_violations, passed) frame, still lazily.

Check kinds (each is a pure column predicate, JVM-side, codegen'd):
  not_null        — violation := column IS NULL
  unique          — violations := n_rows - approx-free exact distinct count
  accepted_values — violation := value not in the allowed set (nulls pass)
  in_range        — violation := value outside [lo, hi] (nulls pass)
  non_negative    — violation := value < 0
  matches         — violation := string fails the anchored regex (nulls pass)

`unique` is the one check that can't be a row predicate; it compiles to a
count_distinct in the same agg (Spark plans multi-distinct aggs via one
Expand — still a single scan, the q136 column-profile shape).

Reference parity: none (the reference has no constraint checking); this
is beyond-reference engine surface for pipeline admission control.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    column: str
    kind: str
    # kind-specific parameters: accepted_values -> values, in_range -> lo/hi,
    # matches -> pattern
    values: tuple = ()
    lo: float | None = None
    hi: float | None = None
    pattern: str | None = None


def _violation_expr(c: Check) -> Column:
    col = F.col(c.column)
    if c.kind == "not_null":
        return col.isNull()
    if c.kind == "accepted_values":
        if not c.values:
            # empty domain: every non-null value violates (isin(*()) would
            # throw at analysis time)
            return col.isNotNull()
        return col.isNotNull() & ~col.isin(*c.values)
    if c.kind == "in_range":
        return col.isNotNull() & ~col.between(F.lit(c.lo), F.lit(c.hi))
    if c.kind == "non_negative":
        return col.isNotNull() & (col < 0)
    if c.kind == "matches":
        return col.isNotNull() & ~col.rlike(c.pattern)
    raise ValueError(f"unknown check kind: {c.kind}")


def compile_suite(df: DataFrame, checks: list[Check]) -> DataFrame:
    """All checks in one aggregate pass -> tidy rows.

    Returns columns: check_name, col_name, n_rows, n_violations, passed."""
    if not checks:
        # zero checks -> empty tidy frame (explode of an empty array is an
        # analysis error); plausible for programmatically filtered suites
        return df.sparkSession.createDataFrame(
            [],
            "check_name string, col_name string, n_rows long,"
            " n_violations long, passed boolean",
        )
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for i, c in enumerate(checks):
        if c.kind == "unique":
            # violations = duplicate non-null rows (count(col) skips nulls,
            # so nulls aren't double-counted) + every null key (PK
            # semantics: a null key is itself a violation)
            aggs.append(
                (
                    F.count(F.col(c.column))
                    - F.countDistinct(F.col(c.column))
                    + F.count_if(F.col(c.column).isNull())
                )
                .cast("long")
                .alias(f"_v{i}")
            )
        else:
            aggs.append(F.count_if(_violation_expr(c)).cast("long").alias(f"_v{i}"))
    wide = df.agg(*aggs)
    tidy = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("check_name"),
                F.lit(c.column).alias("col_name"),
                F.col("_n").alias("n_rows"),
                F.col(f"_v{i}").alias("n_violations"),
                (F.col(f"_v{i}") == 0).alias("passed"),
            )
            for i, c in enumerate(checks)
        ]
    )
    return wide.select(F.explode(tidy).alias("r")).select("r.*")


# --- constraint suggestion (Deequ's suggestion mode) --------------------------

_SUGGEST_NDV_CAP = 10  # accepted_values only for tiny domains


def suggest_checks(df: DataFrame, columns: list[str] | None = None) -> list[Check]:
    """Profile a table in ONE stats pass and propose the Check suite the
    data currently satisfies — the admission-control bootstrap: run it on
    a known-good snapshot, then `compile_suite` the result against every
    future batch.

    Suggestions per column (each holds on the profiled data by
    construction):
      - not_null        when the column has zero nulls
      - unique          when non-null values are all distinct AND no nulls
      - accepted_values for string columns with NDV <= 10 (the distinct
                        set is collected to the driver ONLY after the
                        stats pass has proven it tiny — driver-safe)
      - in_range        for numeric columns (observed [min, max])
      - non_negative    for numeric columns with min >= 0 (tighter prior
                        than the observed range, emitted alongside it)

    The stats pass is one multi-aggregate scan (map-side partials); the
    only second touch is the bounded distinct-set collection for tiny
    string domains. At 100 TB: one scan plus K tiny lookups.
    """
    from pyspark.sql.types import NumericType, StringType

    fields = [
        f
        for f in df.schema.fields
        if columns is None or f.name in columns
    ]
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for f in fields:
        c = F.col(f.name)
        aggs.append(F.count_if(c.isNull()).cast("long").alias(f"{f.name}__nulls"))
        aggs.append(F.countDistinct(c).cast("long").alias(f"{f.name}__ndv"))
        if isinstance(f.dataType, NumericType):
            aggs.append(F.min(c).alias(f"{f.name}__min"))
            aggs.append(F.max(c).alias(f"{f.name}__max"))
    [stats] = df.agg(*aggs).collect()

    out: list[Check] = []
    for f in fields:
        nulls = stats[f"{f.name}__nulls"]
        ndv = stats[f"{f.name}__ndv"]
        non_null = stats["_n"] - nulls
        if nulls == 0:
            out.append(Check(f"{f.name}_not_null", f.name, "not_null"))
        if nulls == 0 and non_null > 0 and ndv == non_null:
            out.append(Check(f"{f.name}_unique", f.name, "unique"))
        if isinstance(f.dataType, StringType) and 0 < ndv <= _SUGGEST_NDV_CAP:
            vals = tuple(
                sorted(
                    r[0]
                    for r in df.select(f.name).filter(F.col(f.name).isNotNull())
                    .distinct()
                    .collect()
                )
            )
            out.append(
                Check(f"{f.name}_domain", f.name, "accepted_values", values=vals)
            )
        if isinstance(f.dataType, NumericType) and non_null > 0:
            lo, hi = stats[f"{f.name}__min"], stats[f"{f.name}__max"]
            out.append(Check(f"{f.name}_range", f.name, "in_range", lo=lo, hi=hi))
            if lo >= 0:
                out.append(Check(f"{f.name}_nonneg", f.name, "non_negative"))
    return out
