"""Tranche 13: bounded-frame order statistics (q180).

q180 rolling median — the robust counterpart of q48's moving sum: an
EXACT 7-day trailing median of daily revenue per order priority. Means
over sliding frames are one codegen'd aggregate; medians need the frame's
order statistics, and the frame is BOUNDED (7 rows), so the right plan is
collect_list over the window + array_sort + two element picks — per-row
cost is O(7 log 7) regardless of table size, and the window shuffles on
the group key like any keyed window. (The engine-native percentile over a
frame would buffer the same 7 values; building the median explicitly
keeps the interpolation expression STRUCTURALLY identical in both
engines — integer-cents elements, (a+b)/2.0/100.0 — so the doubles match
bit-for-bit. A global/unbounded-frame median is a different operator with
a different scale answer: q27's histogram shuffle / q140's weighted
form.) Reference parity: none (the reference has no window frames at
all); this is beyond-reference time-series capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, register

_Q180_ORACLE = """
WITH daily AS (
  SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS d,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2
),
w AS (
  SELECT prio, d,
         list_sort(list(cents) OVER (PARTITION BY prio ORDER BY d
                                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS a
  FROM daily
)
SELECT prio, d, CAST(len(a) AS BIGINT) AS n_days,
       (CASE WHEN len(a) % 2 = 1
             THEN CAST(a[(len(a) + 1) // 2] AS DOUBLE)
             ELSE (CAST(a[len(a) // 2] AS DOUBLE)
                   + CAST(a[len(a) // 2 + 1] AS DOUBLE)) / 2.0 END) / 100.0
       AS med_rev
FROM w
"""


@register(
    "q180_rolling_median",
    _Q180_ORACLE,
    "exact 7-day trailing median of daily revenue per priority (bounded-frame order statistic)",
)
def q180(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderdate").cast("date").alias("d"),
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    w = Window.partitionBy("prio").orderBy("d").rowsBetween(-6, 0)
    a = F.array_sort(F.collect_list("cents").over(w))
    framed = daily.select("prio", "d", a.alias("a"))
    n = F.size("a")
    # element_at is 1-indexed, matching the oracle's 1-indexed list picks
    odd = F.element_at("a", ((n + 1) / 2).cast("int")).cast("double")
    even = (
        F.element_at("a", (n / 2).cast("int")).cast("double")
        + F.element_at("a", (n / 2 + 1).cast("int")).cast("double")
    ) / F.lit(2.0)
    return framed.select(
        "prio",
        "d",
        n.cast("long").alias("n_days"),
        (F.when(n % 2 == 1, odd).otherwise(even) / F.lit(100.0)).alias("med_rev"),
    )
