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
