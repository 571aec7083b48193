"""Bucketed managed tables: co-located joins and aggregations.

Hash-bucketing both sides of a recurring join on the same key and bucket
count lets Spark sort-merge them with ZERO exchange — at 100 TB the
shuffle of a big fact⋈fact join is usually the single largest cost in the
pipeline, and bucketing amortizes it into the (one-off) write.

This wraps ``DataFrameWriter.bucketBy``, which requires ``saveAsTable``
(the bucketing metadata lives in the catalog, not the parquet files).
``join_bucketed`` then reads both tables back by name; the plan for an
equi-join on the bucket key shows SortMergeJoin with no ShuffleExchange
on either side (asserted in tests/test_bucketing.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    *,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.

    Sorting within buckets additionally removes the per-task Sort before a
    sort-merge join and makes min/max pruning effective inside buckets.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def join_bucketed(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — shuffle-free
    when bucket specs match."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
