"""Per-group top-K (the reference's only limit-like operator).

Capability parity with the rank-then-filter pattern at
/root/reference/src/etl_imdb.py:210-212, 218-220, 226-228: row_number over
a partitioned descending window, keep rank <= k.

Scale: Spark >= 3.5 rewrites rank<=k over a window into a per-partition
group-limit (WindowGroupLimit) — partial top-K runs map-side before the
shuffle, so the full sorted group never materializes. That makes this
pattern the right one at 100 TB; no custom operator needed. Callers should
pass tie-breaker columns to make results deterministic (bare row_number
over a tied ordering picks arbitrary survivors — SURVEY.md §2.5 W1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    *,
    rank_col: str = "rk",
) -> DataFrame:
    """Keep the top ``k`` rows per group with their 1-based rank.

    ``order_by`` should include enough columns to be a total order within
    each partition if deterministic output is required.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)
