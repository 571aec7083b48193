"""total_order_ranks must agree bit-for-bit with the SQL window functions
it replaces (row_number / percent_rank / cume_dist / ntile over a global
ORDER BY), while never windowing over a single data partition."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.ranks import total_order_ranks


def _reference(df, order_cols, k):
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.select(
        *order_cols,
        F.row_number().over(w).alias("global_rn"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(k).over(w).alias("bucket"),
    )


def _assert_matches(df, order_cols, k):
    got = {
        tuple(r[c] for c in order_cols): (r.global_rn, r.pct_rank, r.cume, r.bucket)
        for r in total_order_ranks(df, order_cols, ntile=k).collect()
    }
    want = {
        tuple(r[c] for c in order_cols): (r.global_rn, r.pct_rank, r.cume, r.bucket)
        for r in _reference(df, order_cols, k).collect()
    }
    assert got == want


def test_matches_global_window_uneven_ntile(spark):
    # 103 rows, 10 buckets: first 3 buckets get 11 rows, the rest 10
    df = spark.range(103).select((F.col("id") * 37 % 1000).alias("v"), "id")
    _assert_matches(df.repartition(7), ["v", "id"], 10)


def test_matches_when_rows_fewer_than_buckets(spark):
    df = spark.range(4).select(F.col("id").alias("v"))
    _assert_matches(df, ["v"], 10)


def test_single_row_pct_rank_zero(spark):
    df = spark.range(1).select(F.col("id").alias("v"))
    [r] = total_order_ranks(df, ["v"], ntile=10).collect()
    assert (r.global_rn, r.pct_rank, r.cume, r.bucket) == (1, 0.0, 1.0, 1)


def test_no_data_sized_single_partition_window(spark):
    # the only partition-less window allowed is over the per-partition
    # offset table (bounded by partition count); the data-sized windows
    # must all be partitioned by __pid
    df = spark.range(1000).select((F.col("id") % 321).alias("v"), "id")
    plan = (
        total_order_ranks(df, ["v", "id"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "row_number()" in line:
            assert "__pid" in line  # the data-sized rank window is partitioned


def test_large_input_stays_distributed_and_exact(spark):
    # 200k rows through the distributed rank path: spot-check the exact
    # closed-form values at the extremes and a bucket boundary — the
    # scale-up smoke test (a single-partition window would still pass
    # this, but test_no_data_sized_single_partition_window pins the plan)
    n = 200_000
    df = spark.range(n).select(F.col("id").alias("v"))
    out = total_order_ranks(df, ["v"], ntile=7)
    rows = {r.v: r for r in out.where(F.col("v").isin(0, n - 1, n // 2)).collect()}
    assert rows[0].global_rn == 1 and rows[0].pct_rank == 0.0
    assert rows[n - 1].global_rn == n and rows[n - 1].cume == 1.0
    assert rows[n - 1].bucket == 7
    assert rows[n // 2].global_rn == n // 2 + 1


def test_total_order_ranks_survives_persisted_input(spark):
    """Regression: a cached (InMemoryRelation) input used to block AQE's
    runtime exchange reuse, so the local-rank and offset subtrees saw
    DIFFERENT range boundaries and global_rn came back with gaps and
    duplicates. The operator now pins one materialization for cached
    inputs; ranks must be a gap-free permutation of 1..n."""
    from pyspark.sql import functions as F

    from pipeline_pyspark_etl_imdb_spark.operators.ranks import total_order_ranks

    base = spark.range(0, 200_000).select(
        (F.col("id") * 2654435761 % 1000003).alias("v"), F.col("id")
    )
    cached = base.persist()
    try:
        cached.count()
        r = total_order_ranks(cached, ["v", "id"])
        agg = r.agg(
            F.count("*").alias("n"),
            F.min("global_rn").alias("mn"),
            F.max("global_rn").alias("mx"),
            F.countDistinct("global_rn").alias("nd"),
        ).collect()[0]
        assert (agg.n, agg.mn, agg.mx, agg.nd) == (200_000, 1, 200_000, 200_000)
    finally:
        cached.unpersist()


def test_total_order_ranks_survives_projection_of_persisted_input(spark):
    """Regression (ADVICE r4): a PROJECTION over a persisted frame
    reports StorageLevel.NONE at the top level, so the old guard missed
    it while the plan still scanned the InMemoryRelation — the same AQE
    exchange-reuse corruption, one derivation away. The guard now walks
    the optimized plan; ranks must stay a gap-free permutation."""
    from pyspark.sql import functions as F

    from pipeline_pyspark_etl_imdb_spark.operators.ranks import (
        _reads_cached_data,
        total_order_ranks,
    )

    base = spark.range(0, 200_000).select(
        (F.col("id") * 2654435761 % 1000003).alias("v"), F.col("id")
    )
    cached = base.persist()
    try:
        cached.count()
        derived = cached.where(F.col("v") % 2 == 0).select(
            (F.col("v") + 1).alias("v"), "id"
        )
        assert derived.storageLevel.useMemory is False  # the old blind spot
        assert _reads_cached_data(derived)
        r = total_order_ranks(derived, ["v", "id"])
        agg = r.agg(
            F.count("*").alias("n"),
            F.min("global_rn").alias("mn"),
            F.max("global_rn").alias("mx"),
            F.countDistinct("global_rn").alias("nd"),
        ).collect()[0]
        assert agg.mn == 1 and agg.mx == agg.n == agg.nd
    finally:
        cached.unpersist()
