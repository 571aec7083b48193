"""Operator-level physical helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition when the input is under-parallelized.

    A single small file (or one gzip member) scans as ONE task no matter
    how many cores the cluster has; operators that multiply work per row
    (shingle explode, per-token hashing, per-pair scoring) must fan rows
    out first or they run single-threaded. No-op when the scan already has
    enough splits — at 100 TB the file count provides the parallelism and
    this inserts no shuffle.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
