"""SparkSession factory tuned for the local[32] harness.

At cluster scale the same settings apply, except shuffle partitions should
track executor cores (AQE coalesces down at runtime, so erring high is safe).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "pandaspark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
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
