"""Approximate aggregates: the sketch estimates must land within their
declared error bounds of the exact values (the hash-oracle can't check
engine-specific sketches, so this is their correctness gate)."""

from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.plans.registry import QUERIES
from tests.conftest import SF_ORACLE


def test_approx_user_stats_within_bounds(spark):
    got = {r.event_type: r for r in QUERIES["approx_user_stats"](spark, SF_ORACLE).collect()}
    events = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    exact = {
        r.event_type: r
        for r in events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.median("value").alias("median_value"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for et, e in exact.items():
        g = got[et]
        assert g.n_events == e.n  # count is exact
        # HLL++ at rsd=0.02: allow 4 sigma
        assert abs(g.approx_users - e.users) <= max(4 * 0.02 * e.users, 2.0), et
        # KLL-ish percentile with high accuracy parameter: within 5% of median
        assert abs(g.approx_median_value - e.median_value) <= 0.05 * abs(e.median_value) + 1e-6, et


def test_cms_is_upper_bound_with_bounded_size(spark):
    from pipeline_pyspark_etl_imdb_spark.operators import warehouse

    events = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    d, w = 4, 64
    sketch = warehouse.cms_sketch(events, "user_id", d=d, w=w)
    assert sketch.count() <= d * w  # bounded memory regardless of input
    est = {
        r.user_id: r.est
        for r in warehouse.cms_estimate(
            sketch, events.select("user_id"), "user_id", d=d, w=w
        ).collect()
    }
    exact = {
        str(r.user_id): r.n
        for r in events.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert set(est) == set(exact)
    n_total = sum(exact.values())
    for k, e in exact.items():
        assert est[k] >= e, k  # CMS never under-counts
        # eps = e/w: overshoot bounded by eps*N w.h.p. — loose 3x guard
        assert est[k] - e <= 3 * 2.71828 / w * n_total, k
