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
    simple; its cost is O(matches). asof_join_bucketed below is the 100 TB
    form — same semantics (tests assert exact equality), bounded fanout.
    This function is the semantic anchor the scale variants must match.
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


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_on: Column | str,
    right_on: Column | str,
    left_time: str = "ts",
    right_time: str = "ts",
    tiebreak: list[str] | None = None,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Backward as-of LEFT join without the O(matches) intermediate of the
    anchor form: exact-equal to asof_join (asserted in tests), but every
    stage is bounded by (key, time-bucket), so it survives 100 TB.

    Plan: left and right rows union into one frame bucketed by
    floor(epoch/bucket_seconds).
      1. own-bucket match: a window over (key, bucket) ordered by
         (time, side, tiebreak) carries the latest right payload forward to
         each left row — fanout = rows per bucket, never all matches.
      2. prior buckets: right rows aggregate to ONE max_by row per
         (key, bucket); a carry window over these summaries (rows = number
         of buckets, not rows) finds the latest payload strictly before
         each bucket.
      3. per left row: own-bucket match if present (always later than any
         carry), else the carry row; unmatched left rows keep nulls (LEFT
         join semantics, same as the anchor).
    """
    renames = {c: c + "_right" for c in right.columns if c in left.columns}
    for old, new in renames.items():
        right = right.withColumnRenamed(old, new)
    right_time = renames.get(right_time, right_time)
    tiebreak = [renames.get(c, c) for c in (tiebreak or [])]
    if isinstance(right_on, str):
        right_on = renames.get(right_on, right_on)

    right = right.filter(F.col(right_time).isNotNull())
    rkey = right[right_on] if isinstance(right_on, str) else right_on
    lkey = left[left_on] if isinstance(left_on, str) else left_on
    payload_cols = right.columns

    def bkt(c: Column) -> Column:
        return F.floor(F.unix_timestamp(c.cast("timestamp")) / F.lit(bucket_seconds))

    # unified frame: left rows (side=1, null payload) + right rows (side=0)
    payload = F.struct(*[F.col(c) for c in payload_cols])
    order_key = F.struct(F.col(right_time), *[F.col(c) for c in tiebreak])
    r_u = right.select(
        rkey.alias("_k"),
        F.col(right_time).cast("timestamp").alias("_t"),
        bkt(F.col(right_time)).alias("_bkt"),
        F.lit(0).alias("_side"),
        payload.alias("_p"),
        order_key.alias("_ord"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    l_u = left.select(
        lkey.alias("_k"),
        F.col(left_time).cast("timestamp").alias("_t"),
        bkt(F.col(left_time)).alias("_bkt"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_u.schema["_p"].dataType).alias("_p"),
        F.lit(None).cast(r_u.schema["_ord"].dataType).alias("_ord"),
        *left.columns,
    )
    # 1. within (key, bucket): last right payload at or before each row;
    # right rows sort before left rows at equal time (<= semantics), and
    # among equal right times the largest tiebreak comes last (wins)
    own_w = (
        Window.partitionBy("_k", "_bkt")
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_ord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = r_u.unionByName(l_u).withColumn(
        "_own", F.last("_p", ignorenulls=True).over(own_w)
    )
    lefts = unioned.filter(F.col("_side") == 1)

    # 2. one summary row per (key, bucket) of right rows; carry = latest
    # summary strictly before the bucket (window over summaries only)
    summ = right.groupBy(
        rkey.alias("_k"), bkt(F.col(right_time)).alias("_bkt")
    ).agg(F.max_by(payload, order_key).alias("_bucket_last"))
    l_buckets = lefts.select("_k", "_bkt").distinct()
    universe = l_buckets.join(summ, ["_k", "_bkt"], "full")
    carry_w = (
        Window.partitionBy("_k")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = universe.withColumn(
        "_carry", F.last("_bucket_last", ignorenulls=True).over(carry_w)
    ).select("_k", "_bkt", "_carry")

    # 3. own-bucket match wins (its time is >= any prior bucket's)
    best = F.coalesce(F.col("_own"), F.col("_carry"))
    out = lefts.join(carry, ["_k", "_bkt"], "left").select(
        *left.columns, *[best[c].alias(c) for c in payload_cols]
    )
    return out


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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: a hot join key funnels all its rows into
    ONE reducer of a shuffle join — the classic straggler at 100 TB. Here
    each left row gets a deterministic salt in [0, salt) (hash of the full
    row, so retries re-salt identically) and the right side replicates once
    per salt value; joining on (key, salt) spreads a hot key's probe work
    across `salt` tasks at the cost of salt-times the (small but
    unbroadcastable) right side. Exact-equal to the plain join by test.

    Use when the right side is too big to broadcast AND the left is
    skewed; with AQE on, skew-join splitting does this adaptively for
    sort-merge joins — this is the static, plan-deterministic form (the
    join sibling of q50's salted two-phase aggregation)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    l_salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    lefts = left.withColumn("_salt", l_salt)
    rights = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return lefts.join(rights, [on, "_salt"], how).drop("_salt")


def latest_per_key(
    df: DataFrame, keys: list[str], order_by: list[str]
) -> DataFrame:
    """CDC-style compaction: the newest row per key (deterministic order).
    The window shuffles once on the key — the minimal plan for this op."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc_nulls_last() for c in order_by])
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def sequential_ids(
    df: DataFrame, order_cols: list[str], alias: str = "tid", start: int = 1
) -> DataFrame:
    """Globally-sequential row numbers in `order_cols` order WITHOUT a
    single-partition window — the 100 TB form of SURVEY.md W2/P13
    (known-hard list §7.4 item 4); reference semantic: panda.py:685-691.

    Phase 1: repartitionByRange gives range-ordered partitions (equal keys
    co-located, so numbering is deterministic for any total-order key);
    row_number runs per partition in parallel. Phase 2: per-partition
    counts prefix-sum into broadcast offsets — the only single-partition
    work is a window over n_partitions rows. Exact-equal to the global
    window form by construction (asserted in tests)."""
    ranged = df.repartitionByRange(*order_cols).withColumn("_pid", F.spark_partition_id())
    part_w = Window.partitionBy("_pid").orderBy(
        *[F.col(c).asc_nulls_first() for c in order_cols]
    )
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    offsets = counts.withColumn(
        "_offset",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("long"),
        ),
    ).select("_pid", "_offset")
    return (
        ranged.withColumn("_rn", F.row_number().over(part_w))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(alias, (F.col("_rn") + F.col("_offset") + F.lit(start - 1)).cast("long"))
        .drop("_pid", "_rn", "_offset")
    )


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
