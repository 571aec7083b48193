"""Exact deduplication operators.

Covers the reference's two dedup shapes (SURVEY.md §2.4 A3/A4):

- full-row distinct (/root/reference/src/etl_imdb.py:153, 179, 181)
- key-subset dedup keeping an arbitrary survivor (:139, :148)

plus a deterministic variant the reference lacks: keep the row that sorts
first by explicit tie-breakers. At scale the deterministic form costs the
same shuffle as dropDuplicates (hash partition by key) but is
reproducible, which a 100 TB pipeline needs for idempotent re-runs.
Near-duplicate (MinHash/SimHash/Jaccard) dedup lives in
``operators/neardup.py``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_exact_rows(df: DataFrame) -> DataFrame:
    """Set-distinct on all columns."""
    return df.dropDuplicates()


def dedup_by_key(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """One arbitrary survivor per key (reference semantics; fast path —
    map-side partial aggregation, no window sort)."""
    return df.dropDuplicates(list(keys))


def dedup_by_key_deterministic(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]
) -> DataFrame:
    """One survivor per key: the row sorting first by ``order_by``.

    row_number (not rank) guarantees exactly one row per key even on ties
    in the tie-breakers.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
