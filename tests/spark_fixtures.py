"""Shared SparkSession for Spark-backed tests."""

import os

from pyspark.sql import SparkSession

_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "4")


def get_spark() -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{_CPUS}]")
        .appName("scotty-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
