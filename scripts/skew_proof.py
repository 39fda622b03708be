"""Salted-join evidence under a PLANTED hot key (docs/SCALING.md).

The uniform synthetic scale-ups can't exercise the skew machinery — every
key has ~K rows. This script runs against a set built with
`make_scaled.py ... <K> 0.25` (25% of lineitem rows remapped to
l_suppkey=0), and measures the join of lineitem against a deliberately
non-broadcast right side (per-supplier aggregates) three ways:

  plain   sort-merge/shuffle-hash join, AQE skew handling OFF — the hot
          key's probe rows land in ONE task: the 100 TB straggler.
  salted  operators.salted_join (key, salt) fan-out — static,
          plan-deterministic skew relief; must be row-for-row identical.
  aqe     the same plain join with spark.sql.adaptive.skewJoin enabled —
          the adaptive path we rely on at cluster scale.

Equality is checked exactly: count + xxhash64-sum + cents-sum over the
full join output on each arm (order-insensitive content digest, no
driver-side materialization of 12M rows).

Usage: python scripts/skew_proof.py [skew_dir]    (default /tmp/skew20)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SKEW_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skew20"
RUNS = int(os.environ.get("TQ_RUNS", "3"))


def digest(joined: DataFrame) -> tuple:
    """Order-insensitive exact content digest of the join output."""
    [row] = joined.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal accumulator: a long sum of 12M xxhash64 values overflows
        # under ANSI arithmetic
        F.sum(
            F.xxhash64(*[F.col(c) for c in sorted(joined.columns)]).cast(
                "decimal(38,0)"
            )
        ).alias("h"),
        F.sum("v_cents").alias("s"),
    ).collect()
    return (row.n, row.h, row.s)


def main() -> None:
    # standalone builder (not session.get_spark): this evidence script pins
    # its own knobs (no-broadcast, AQE arms) and must not inherit product
    # session defaults that could mask the effect under measurement
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # the right side must NOT broadcast, or there is no shuffle join to
        # skew (broadcast IS the first-choice fix when the dim side fits;
        # this proof is about the case where it doesn't)
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.ui.retainedExecutions", "2")
        .config("spark.ui.enabled", "false")
        .appName("skew-proof")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pandaspark.operators import salted_join

    li = spark.read.parquet(f"{SKEW_DIR}/lineitem.parquet").select(
        "l_suppkey",
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v_cents"),
    )
    # per-supplier aggregate: small, but declared unbroadcastable above —
    # the stand-in for a right side that doesn't fit executor memory
    dim = li.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("supp_n"), F.sum("v_cents").alias("supp_cents")
    )
    dim = dim.localCheckpoint(eager=True)  # price the join, not the agg

    hot = li.filter(F.col("l_suppkey") == 0).count()
    total = li.count()
    print(f"rows={total}  hot_key_rows={hot} ({100.0 * hot / total:.1f}%)")

    def run(arm: str, skew_on: bool, salted: bool) -> tuple:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        if salted:
            j = salted_join(li, dim, "l_suppkey", salt=32)
        else:
            j = li.join(dim, "l_suppkey")
        d = digest(j)  # also the warm-up
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.time()
            j.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        print(f"{arm:7s} {best:7.3f}s  digest={d}")
        return d

    d_plain = run("plain", skew_on=False, salted=False)
    d_salt = run("salted", skew_on=False, salted=True)
    d_aqe = run("aqe", skew_on=True, salted=False)
    assert d_plain == d_salt == d_aqe, "join arms disagree — skew relief broke the result"
    print("all three arms exact-equal")
    spark.stop()


if __name__ == "__main__":
    main()
