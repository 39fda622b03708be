"""Composite operators Spark lacks natively (SURVEY.md §2.4 note,
pyspark guide 'Common OLAP patterns'): as-of join, range join helper,
latest-per-key compaction. All compositions of built-in ops — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: Column | str,
    right_on: Column | str,
    left_time: str = "ts",
    right_time: str = "ts",
    how: str = "left",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with matching key and
    right_time <= left_time (a backward as-of join).

    Implementation: non-equi join + per-left-row window keeping the max
    right_time (deterministic via explicit tiebreak columns). Correct and
    simple; its cost is O(matches). At 100 TB the standard refinement is to
    bucket both sides by (key, time_bucket) so each left row joins only its
    own and the previous bucket, or to applyInPandas(merge_asof) per key —
    same semantics, bounded fanout. This function is the semantic anchor
    the scale variants must match.
    """
    # rename colliding right columns so the joined frame has unique names
    renames = {c: c + "_right" for c in right.columns if c in left.columns}
    for old, new in renames.items():
        right = right.withColumnRenamed(old, new)
    right_time = renames.get(right_time, right_time)
    tiebreak = [renames.get(c, c) for c in (tiebreak or [])]
    if isinstance(right_on, str):
        right_on = renames.get(right_on, right_on)

    lt, rt = left[left_time], right[right_time]
    lkey = left[left_on] if isinstance(left_on, str) else left_on
    rkey = right[right_on] if isinstance(right_on, str) else right_on
    j = left.join(right, (rkey == lkey) & (rt <= lt), how)
    order = [rt.desc_nulls_last()] + [F.col(c).desc_nulls_last() for c in tiebreak]
    w = Window.partitionBy(*[left[c] for c in left.columns]).orderBy(*order)
    return j.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int,
) -> DataFrame:
    """point-in-interval join scaled by bucketing: explode each interval to
    the buckets it covers, equi-join on bucket, then re-check the exact
    predicate. Turns an O(N*M) cross-range join into a hash join whose
    fanout is interval_width / bucket_width."""
    lb = (F.col(left_point) / bucket_width).cast("long").alias("_bucket")
    rb = F.explode(
        F.sequence(
            (F.col(right_lo) / bucket_width).cast("long"),
            (F.col(right_hi) / bucket_width).cast("long"),
        )
    ).alias("_bucket")
    lt = left.select("*", lb)
    rt = right.select("*", rb)
    return lt.join(rt, "_bucket").filter(
        (F.col(left_point) >= F.col(right_lo)) & (F.col(left_point) <= F.col(right_hi))
    ).drop("_bucket")


def latest_per_key(
    df: DataFrame, keys: list[str], order_by: list[str]
) -> DataFrame:
    """CDC-style compaction: the newest row per key (deterministic order).
    The window shuffles once on the key — the minimal plan for this op."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc_nulls_last() for c in order_by])
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def two_phase_running_total(
    df: DataFrame, order_cols: list[str], value: Column, alias: str = "running_total"
) -> DataFrame:
    """Globally-ordered cumulative sum WITHOUT a single-partition window —
    the 100 TB form of SURVEY.md W1 (known-hard list §7.4 item 4).

    Phase 1: repartitionByRange on the sort key gives range-ordered
    partitions; a window partitioned by spark_partition_id computes each
    partition's local cumsum in parallel. Phase 2: per-partition totals
    (one tiny row per partition) get prefix-summed and broadcast back as
    offsets. The only single-partition work is the offsets window over
    n_partitions rows. `value` must be exact (integer cents) so that
    partial sums + offsets equal the sequential total bit-for-bit;
    tests/test_operators.py asserts exact equality with the naive global
    window.
    """
    ranged = df.repartitionByRange(*order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    part_w = Window.partitionBy("_pid").orderBy(
        *[F.col(c).asc_nulls_first() for c in order_cols]
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = ranged.withColumn("_v", value).withColumn(
        "_local_cum", F.sum("_v").over(part_w)
    )
    totals = local.groupBy("_pid").agg(F.sum("_v").alias("_part_total"))
    offsets = totals.withColumn(
        "_offset",
        F.coalesce(
            F.sum("_part_total").over(
                Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("long"),
        ),
    ).select("_pid", "_offset")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(alias, F.col("_local_cum") + F.col("_offset"))
        .drop("_pid", "_v", "_local_cum", "_offset")
    )
