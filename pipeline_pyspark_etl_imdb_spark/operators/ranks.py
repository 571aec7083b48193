"""Distributed global ranks — ntile / percent_rank / cume_dist without a
single-partition window.

``Window.orderBy(...)`` with no partitionBy funnels every row through ONE
task (Spark warns exactly this); fine at fixture scale, fatal at 100 TB.
But a global rank under a TOTAL order decomposes exactly:

    repartitionByRange(order)        -- range shuffle, ascending ids
    local row_number per partition   -- partitioned window, parallel
    + cumulative count of earlier partitions  -- tiny offset table

The offset table has one row per partition (cluster-bounded, not
data-bounded), so its cumsum window is single-partition BY DESIGN over
~hundreds of rows, then broadcast back. Total cost: one range shuffle +
one map-side window — the same shape a distributed sort uses.

Requires a total order (the ordering columns must be a unique key —
append a tiebreaker column if needed): with no ties, rank == row_number
and percent_rank/cume_dist/ntile all derive from the global row number
with exact integer arithmetic, matching the SQL window functions
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.util import eager_checkpoint


def _reads_cached_data(df: DataFrame) -> bool:
    """True when the frame's plan scans ANY persisted data — either the
    frame itself is marked for caching (storageLevel) or an
    InMemoryRelation appears anywhere in the optimized plan (a
    projection/filter over a persisted frame reports StorageLevel.NONE
    at the top level but still reads the cached scan underneath, which
    re-exposes the AQE exchange-reuse rank-corruption hazard)."""
    if df.storageLevel.useMemory or df.storageLevel.useDisk:
        return True
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:  # pragma: no cover - defensive: assume the worst
        return True
    return "InMemoryRelation" in plan


def total_order_ranks(
    df: DataFrame,
    order_cols: list[str],
    *,
    ntile: int | None = None,
    materialize_input: bool = False,
) -> DataFrame:
    """Append ``global_rn`` (1-based), ``pct_rank``, ``cume`` — and
    ``decile``-style ``bucket`` when ``ntile`` is given — computed
    distributedly under the total order ``order_cols``.

    Matches SQL ``row_number() / percent_rank() / cume_dist() / ntile(k)
    OVER (ORDER BY ...)`` exactly when the ordering is tie-free.

    CORRECTNESS PRECONDITION (exchange reuse): the local-rank and
    offset-table subtrees both consume the range shuffle of ``df``; they
    agree only because AQE reuses ONE exchange at runtime (range
    boundaries are re-SAMPLED per execution, so two independent shuffles
    would disagree and global_rn would come back with gaps and
    duplicates). A PERSISTED input (InMemoryRelation) blocks that
    runtime stage reuse — observed corrupting ranks at sf0.1 — so a
    cached ``df`` is eagerly localCheckpoint'ed here to pin one
    materialization; uncached inputs pay nothing. The guard inspects
    the OPTIMIZED PLAN for InMemoryRelation, not just the top-level
    storageLevel: a projection/filter OVER a persisted frame reports
    StorageLevel.NONE but still plans the cached scan underneath.

    ``materialize_input``: ``repartitionByRange`` SAMPLES its child to
    pick range boundaries, which executes the child's whole subtree one
    extra time before the shuffle. When the input is a SMALL aggregate
    of an expensive subtree (a vocabulary groupBy over a full-corpus
    token explode: the r7→r8 vocab-family root-cause), that re-execution
    doubles the dominant stage — at 100 TB, the corpus explode runs
    twice for a vocabulary-sized result. Passing True localCheckpoints
    the input first, so the expensive subtree runs ONCE and only the
    small materialized frame is sampled + shuffled. Leave False (the
    default) for data-sized inputs, where materializing costs more than
    recomputing a cheap scan.
    """
    if materialize_input or _reads_cached_data(df):
        # the checkpoint backs the returned plan; the harness frees its
        # blocks at the next release_tracked()
        df = eager_checkpoint(df)
    cols = [F.col(c) for c in order_cols]
    part = df.repartitionByRange(*cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("__pid").orderBy(*cols)
    local = part.withColumn("__rn", F.row_number().over(w_local))
    # one row per partition; the cumsum window is bounded by partition
    # count (cluster size), never by data size
    sizes = local.groupBy("__pid").agg(F.count("*").alias("__cnt"))
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = sizes.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(
            Window.orderBy("__pid").rangeBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("__n"),
    )
    out = local.join(F.broadcast(offsets), "__pid").withColumn(
        "global_rn", (F.col("__off") + F.col("__rn")).cast("bigint")
    )
    n = F.col("__n")
    rn = F.col("global_rn")
    out = out.withColumn(
        "pct_rank",
        F.when(n > 1, (rn - 1).cast("double") / (n - 1)).otherwise(F.lit(0.0)),
    ).withColumn("cume", rn.cast("double") / n)
    if ntile is not None:
        out = out.withColumn("bucket", _ntile_from_rn(rn, n, ntile))
    return out.drop("__pid", "__rn", "__off", "__n")


def _ntile_from_rn(rn: Column, n: Column, k: int) -> Column:
    """SQL NTILE(k) from a 1-based tie-free row number: the first n % k
    buckets hold ceil(n/k) rows, the rest floor(n/k) — exact integer
    arithmetic, no floating point."""
    q = F.floor(n / k)  # base bucket size
    r = n % k  # first r buckets get one extra row
    big_span = r * (q + 1)  # rows covered by the larger buckets
    return (
        F.when(rn <= big_span, F.ceil(rn / (q + 1)))
        .otherwise(r + F.ceil((rn - big_span) / q))
        .cast("int")
    )


def total_order_prefix_sums(
    df: DataFrame,
    order_cols: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Append ``cum_<col>`` (inclusive running sum under the total order
    ``order_cols``) for each of ``sum_cols`` — the distributed prefix
    sum, same two-phase shape as ``total_order_ranks``: range shuffle +
    per-partition partitioned window, then one partition-count-bounded
    offset table broadcast back. Matches
    ``sum(col) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`` exactly
    when the ordering is tie-free and the summands are integers
    (BIGINT arithmetic end to end — float prefix sums would be
    order-sensitive).

    Same exchange-reuse precondition as total_order_ranks: a persisted
    input blocks AQE stage reuse and desynchronizes the two shuffles, so
    frames whose plans read any cached data are pinned via
    localCheckpoint first (same derived-frame-aware guard)."""
    if _reads_cached_data(df):
        df = eager_checkpoint(df)
    cols = [F.col(c) for c in order_cols]
    part = df.repartitionByRange(*cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("__pid").orderBy(*cols)
    local = part
    for c in sum_cols:
        local = local.withColumn(
            f"__run_{c}",
            F.sum(F.col(c).cast("bigint")).over(
                w_local.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    sizes = local.groupBy("__pid").agg(
        *[F.sum(F.col(c).cast("bigint")).alias(f"__tot_{c}") for c in sum_cols]
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.select(
        "__pid",
        *[
            F.coalesce(F.sum(f"__tot_{c}").over(w_off), F.lit(0)).alias(
                f"__off_{c}"
            )
            for c in sum_cols
        ],
    )
    out = local.join(F.broadcast(offsets), "__pid")
    for c in sum_cols:
        out = out.withColumn(
            f"cum_{c}", (F.col(f"__off_{c}") + F.col(f"__run_{c}")).cast("bigint")
        )
    return out.drop(
        "__pid", *[f"__run_{c}" for c in sum_cols], *[f"__off_{c}" for c in sum_cols]
    )
