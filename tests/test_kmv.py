"""KMV distinct sketch: exactness below k, mergeability (the defining
sketch property), and the (k-1)/u_k estimator's error bound."""

import pytest
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.warehouse import (
    kmv_estimate,
    kmv_sketch,
)
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_ORACLE}/events.parquet")


def test_exact_below_k(spark):
    df = spark.createDataFrame(
        [("g", i % 10) for i in range(1000)], "grp string, v int"
    )
    est = kmv_estimate(kmv_sketch(df, ["grp"], "v", k=64), ["grp"], k=64).collect()
    assert len(est) == 1
    assert est[0].n_kept == 10
    assert est[0].est_distinct == 10.0


def test_merge_is_resketch_of_union(events):
    """sketch(A union B) == top-k of (sketch(A) union sketch(B)) — partial
    aggregation IS the merge, so sharded sketch building is lossless."""
    from pipeline_pyspark_etl_imdb_spark.operators.topk import top_k_per_group

    a = events.where(F.col("event_id") % 2 == 0)
    b = events.where(F.col("event_id") % 2 == 1)
    sk_a = kmv_sketch(a, ["event_type"], "user_id", k=32).select("event_type", "h")
    sk_b = kmv_sketch(b, ["event_type"], "user_id", k=32).select("event_type", "h")
    merged = top_k_per_group(
        sk_a.union(sk_b).dropDuplicates(["event_type", "h"]),
        ["event_type"],
        [F.asc("h")],
        32,
    )
    full = kmv_sketch(events, ["event_type"], "user_id", k=32)
    got = {(r.event_type, r.h, r.rk) for r in merged.collect()}
    want = {(r.event_type, r.h, r.rk) for r in full.collect()}
    assert got == want


def test_estimate_within_bound(events):
    """Relative error of (k-1)/u_k is ~1/sqrt(k-2); allow 4 sigma."""
    k = 64
    est = {
        r.event_type: r.est_distinct
        for r in kmv_estimate(
            kmv_sketch(events, ["event_type"], "user_id", k=k), ["event_type"], k=k
        ).collect()
    }
    truth = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(truth)
    tol = 4.0 / (k - 2) ** 0.5
    for etype, n in truth.items():
        if n < k:
            assert est[etype] == float(n), etype
        else:
            assert abs(est[etype] - n) / n <= tol, (etype, est[etype], n)


def test_sketch_rows_bounded(events):
    sk = kmv_sketch(events, ["event_type"], "user_id", k=16)
    counts = sk.groupBy("event_type").count().collect()
    assert all(r["count"] <= 16 for r in counts)


def test_kmv_jaccard_estimates_true_overlap(spark):
    """Synthetic groups with engineered overlap: A=0..199, B=100..299
    (true J=1/3), C disjoint (true J=0). The k=64 estimate must land
    within the standard KMV error band (~1/sqrt(k) ≈ 0.125) for the
    overlapping pair and exactly 0 for the disjoint pair."""
    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import (
        kmv_jaccard_pairs,
    )

    rows = (
        [("A", v) for v in range(200)]
        + [("B", v) for v in range(100, 300)]
        + [("C", v) for v in range(1000, 1100)]
    )
    df = spark.createDataFrame(rows, "g string, v bigint")
    got = {
        (r.group_a, r.group_b): r for r in kmv_jaccard_pairs(df, "g", "v").collect()
    }
    assert set(got) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = got[("A", "B")]
    assert abs(ab.jaccard_est - 1 / 3) < 0.125, ab.jaccard_est
    assert got[("A", "C")].n_both == 0
    assert got[("B", "C")].jaccard_est == 0.0


def test_kmv_jaccard_identical_groups_is_one(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import (
        kmv_jaccard_pairs,
    )

    rows = [("X", v) for v in range(50)] + [("Y", v) for v in range(50)]
    df = spark.createDataFrame(rows, "g string, v bigint")
    got = kmv_jaccard_pairs(df, "g", "v").collect()[0]
    assert got.jaccard_est == 1.0
    assert got.n_union_kept == 50  # below k: sketch IS the set


def test_quantile_sketch_small_group_is_exact(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import (
        hash_sample_quantile_sketch,
    )

    # group smaller than k: the reservoir IS the population -> exact
    df = spark.createDataFrame(
        [("g", i, float(i)) for i in range(1, 12)], "g string, id long, v double"
    )
    out = hash_sample_quantile_sketch(
        df, ["g"], "v", ["id"], k=128, quantiles=(0.5, 0.9)
    ).collect()[0]
    assert out.n_sample == 11
    assert out.p50_est == 6.0  # exact interpolated median of 1..11
    assert out.p90_est == 10.0


def test_quantile_sketch_error_band_and_determinism(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import (
        hash_sample_quantile_sketch,
    )

    n = 4000
    df = spark.createDataFrame(
        [("g", i, float(i)) for i in range(n)], "g string, id long, v double"
    )
    r1 = hash_sample_quantile_sketch(df, ["g"], "v", ["id"], k=128).collect()[0]
    r2 = hash_sample_quantile_sketch(df, ["g"], "v", ["id"], k=128).collect()[0]
    # content-defined reservoir: bit-identical across runs
    assert (r1.p50_est, r1.p90_est) == (r2.p50_est, r2.p90_est)
    assert r1.n_sample == 128
    # order-statistic error band ~ sqrt(q(1-q)/k): +-4 sigma on uniform
    assert abs(r1.p50_est - n / 2) < 4 * (0.25 / 128) ** 0.5 * n
    assert abs(r1.p90_est - 0.9 * n) < 4 * (0.09 / 128) ** 0.5 * n


def test_quantile_sketch_merge_law(spark):
    from pyspark.sql import functions as F
    from pipeline_pyspark_etl_imdb_spark.operators.corpus import hex_uniform
    from pipeline_pyspark_etl_imdb_spark.operators.topk import top_k_per_group

    # the reservoir of a union equals the k-min of the two reservoirs'
    # union (same law as KMV) — so shard sketches merge without re-reading
    rows = [("g", i, float(i)) for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    half_a, half_b = df.where("id % 2 = 0"), df.where("id % 2 = 1")

    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import (
        hash_sample_quantile_sketch,
    )

    whole = hash_sample_quantile_sketch(df, ["g"], "v", ["id"], k=64).collect()[0]
    # union-of-shard-reservoirs: sketch each half with k=64, then sketch
    # the union of kept rows again with k=64 — estimates must be identical
    def kept(frame):
        # mirrors the operator's prefix-free key: per-column md5 digests
        h = frame.select(
            "g",
            "v",
            F.md5(
                F.concat(F.md5(F.col("id").cast("string")), F.lit(":qsketch"))
            ).alias("__h"),
            "id",
        ).select("g", "v", "id", hex_uniform("__h", 12).alias("h"))
        return top_k_per_group(h, ["g"], [F.asc("h")], 64).select("g", "v", "id")

    merged_input = kept(half_a).unionByName(kept(half_b))
    merged = hash_sample_quantile_sketch(
        merged_input, ["g"], "v", ["id"], k=64
    ).collect()[0]
    assert (whole.p50_est, whole.p90_est) == (merged.p50_est, merged.p90_est)
