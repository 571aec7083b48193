"""Parquet scan & sink.

Sink parity with ``write_parquet`` (/root/reference/src/etl_imdb.py:238-242):
overwrite mode with optional hive-style partitioning; the session pins
``partitionOverwriteMode=dynamic`` so partitioned overwrites only replace
touched partitions (reference: src/etl_imdb.py:85).

Scale: partitioned writes give downstream readers partition pruning; the
optional ``max_records_per_file`` keeps individual files bounded at 100 TB
so a single hot partition can't produce a multi-GB file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    *,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)
