"""SparkSession factory tuned for the local[32] harness.

At cluster scale the same settings apply, except shuffle partitions should
track executor cores (AQE coalesces down at runtime, so erring high is safe).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "pandaspark", aqe: bool = True) -> SparkSession:
    """aqe: adaptive query execution. ON is the production default (runtime
    shuffle coalescing, skew-join splitting — non-negotiable at 100 TB).
    At toy scale (every shuffle ≪ one target partition) AQE has nothing to
    adapt, while each adaptive stage boundary costs a stage-materialize +
    replan round-trip that dwarfs the query itself — measured at sf0.1:
    q11 rollup 1.17s→0.41s, q34 LSH 2.03s→1.37s with AQE off, identical
    plans otherwise. bench.py passes aqe=False only below a data-size
    threshold; correctness runs and tests keep the production setting."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true" if aqe else "false")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # the codegen class cache defaults to 100 entries JVM-wide; a
        # 201-query workload compiles ~5-10 WholeStageCodegen classes per
        # query, so at the default every query re-pays janino compilation
        # whenever >= ~15 other queries ran since its last execution
        # (measured at sf0.1: q58's first run after a 30-query churn 3.1 s
        # vs 2.3 s with the cache sized to hold the whole workload).
        # Metaspace cost is a few KB per entry — negligible
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .config("spark.ui.enabled", "false")
        # no stderr progress bars: the bench driver captures a bounded tail
        # of merged output, and \r-spam competes with the JSON result line
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


def prep(spark: SparkSession) -> SparkSession:
    """Pin runtime confs that correctness depends on, regardless of who
    built the session (the driver passes its own session into queries).

    UTC matters because the testdata parquet stores naive timestamps which
    DuckDB interprets as-is; Spark must not shift them through a local zone.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
