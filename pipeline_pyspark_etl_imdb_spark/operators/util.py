"""Operator-level physical helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame

# Persisted subtrees registered by operators (ANN indexes, LSH bases,
# candidate sets). A query result is lazy, so the operator itself can't
# unpersist before the consumer materializes; harnesses (bench.py, the
# oracle test suite) call release_tracked() after each materialization so
# cached index state never leaks into the next query's memory budget.
_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() + register for deterministic release via release_tracked()."""
    _TRACKED.append(df.persist())
    return df


def release_tracked() -> None:
    """Unpersist every tracked frame (idempotent, exception-safe).

    BLOCKING unpersist, deliberately: the default async release lets
    block removal land in the MIDDLE of the next query, which showed up
    as alternating 4 s / 17 s runs of ann_pq in bench.py (the released
    index cache was being reclaimed while the re-run rebuilt it). Paying
    the removal synchronously keeps cleanup out of every timed or
    user-facing region that follows."""
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(True)
        except Exception:
            pass


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


def release_local_checkpoint(df: DataFrame) -> None:
    """Free the storage blocks behind a localCheckpoint'ed frame.

    ``DataFrame.unpersist()`` is a NO-OP for local checkpoints: it talks
    to the SQL CacheManager, while localCheckpoint pins its blocks at
    the RDD level (verified: getRDDStorageInfo still lists the blocks
    after df.unpersist()). Iterative operators (pagerank, k-core, LPA)
    chain one checkpoint per round, so without RDD-level release a long
    shared-JVM session accumulates n_rounds node-sized block sets per
    call. This walks to the LogicalRDD under the analyzed plan and
    unpersists the actual RDD — the frame is UNUSABLE afterwards (its
    lineage was truncated), so only call it on intermediates that are
    provably no longer referenced.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getName().endswith("LogicalRDD"):
            plan.rdd().unpersist(False)
    except Exception:  # pragma: no cover - best-effort cleanup
        pass
