"""Tranche 10: weighted order statistics.

q140 exact weighted median per group — the operator behind "median price
weighted by volume" reports, which Spark has no native form for (and
whose naive plan, a per-group sort window, caps parallelism at the group
count — q27's documented skew trap). The scale-right plan is the same
histogram shuffle q27 uses: aggregate weights per (group, value) first
(map-side combinable, shuffle keyed on BOTH columns so hot groups still
spread), then one cumulative window over the NDV-sized histogram, and
pick the lower weighted median (first value whose cumulative weight
reaches half the total). Exact integer weights end-to-end — no
interpolation, no float accumulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, register

_Q140_ORACLE = """
WITH h AS (
  SELECT l_returnflag AS grp,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS v_cents,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
  FROM lineitem
  GROUP BY l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT)
),
c AS (
  SELECT grp, v_cents, w,
         sum(w) OVER (PARTITION BY grp ORDER BY v_cents
                      ROWS UNBOUNDED PRECEDING) AS cw,
         sum(w) OVER (PARTITION BY grp) AS tw
  FROM h
)
SELECT grp AS l_returnflag,
       CAST(min(CASE WHEN cw * 2 >= tw THEN v_cents END) AS BIGINT) / 100.0
         AS weighted_median,
       CAST(max(tw) AS BIGINT) AS total_weight
FROM c
GROUP BY grp
"""


@register(
    "q140_weighted_median",
    _Q140_ORACLE,
    "exact weighted median per group via the skew-safe histogram shuffle",
)
def q140(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v_cents"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    # histogram: shuffle keyed on (group, value) — a hot group's rows still
    # spread across the cluster; the windowed frame below is NDV-sized
    h = li.groupBy("grp", "v_cents").agg(F.sum("q").alias("w"))
    wg = Window.partitionBy("grp")
    c = h.withColumn(
        "cw",
        F.sum("w").over(wg.orderBy("v_cents").rowsBetween(Window.unboundedPreceding, 0)),
    ).withColumn("tw", F.sum("w").over(wg))
    return c.groupBy("grp").agg(
        (
            F.min(F.when(F.col("cw") * 2 >= F.col("tw"), F.col("v_cents"))).cast("long")
            / F.lit(100.0)
        ).alias("weighted_median"),
        F.max("tw").alias("total_weight"),
    ).select(F.col("grp").alias("l_returnflag"), "weighted_median", "total_weight")
