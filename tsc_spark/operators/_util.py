"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ensure_min_partitions"]


def ensure_min_partitions(df: DataFrame) -> DataFrame:
    """Round-robin repartition ONLY when the scan is under-partitioned.

    Small at-rest tables arrive as a single split and would serialize
    every downstream narrow stage (explode, hashing, UDFs).  A large
    scan (100 TB = thousands of splits) already exceeds cluster
    parallelism, so this returns the input unchanged — no shuffle is
    ever added on the big-data path."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df
    if current >= target:
        return df
    return df.repartition(target)
