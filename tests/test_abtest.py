"""A/B experimentation gates: growth-stable assignment, a hand-checked
z statistic, and the funnel-latency report against pure Python."""

import math

import pytest
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators import abtest, eventtime
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{SF_SMOKE}/events.parquet")


def test_assignment_growth_stable(spark, events):
    full = {r.user_id: r.variant for r in abtest.ab_assignment(events).collect()}
    half = {
        r.user_id: r.variant
        for r in abtest.ab_assignment(
            events.where(F.col("user_id") % 2 == 0)
        ).collect()
    }
    assert half == {u: v for u, v in full.items() if u % 2 == 0}
    assert set(full.values()) == {"A", "B"}


def test_report_matches_python(events):
    rows = events.select("user_id", "event_type").collect()
    purchases: dict = {}
    users = set()
    for r in rows:
        users.add(r.user_id)
        if r.event_type == "purchase":
            purchases[r.user_id] = purchases.get(r.user_id, 0) + 1
    variant = {
        r.user_id: r.variant for r in abtest.ab_assignment(events).collect()
    }
    stats = {"A": [0, 0], "B": [0, 0]}
    for u in users:
        s = stats[variant[u]]
        s[0] += 1
        s[1] += 1 if purchases.get(u, 0) >= 14 else 0
    (n_a, c_a), (n_b, c_b) = stats["A"], stats["B"]
    got = abtest.ab_experiment_report(events).collect()[0]
    assert (got.n_a, got.conv_a, got.n_b, got.conv_b) == (n_a, c_a, n_b, c_b)
    ra, rb = c_a / n_a, c_b / n_b
    pooled = (c_a + c_b) / (n_a + n_b)
    se = math.sqrt(pooled * (1 - pooled) * (1 / n_a + 1 / n_b))
    assert got.z_score == pytest.approx((rb - ra) / se, rel=1e-12)
    assert got.rel_lift == pytest.approx((rb - ra) / ra, rel=1e-12)


def test_time_to_convert_matches_python(events):
    rows = events.select(
        "user_id", "event_type", eventtime.ts_micros(events).alias("us")
    ).collect()
    fv: dict = {}
    fp: dict = {}
    for r in rows:
        if r.event_type == "view":
            fv[r.user_id] = min(fv.get(r.user_id, r.us), r.us)
        elif r.event_type == "purchase":
            fp[r.user_id] = min(fp.get(r.user_id, r.us), r.us)
    lat = sorted(
        (fp[u] - fv[u]) / 1e6 for u in fv if u in fp and fv[u] < fp[u]
    )
    got = abtest.time_to_convert(events).collect()[0]
    assert got.n_converted == len(lat)
    assert got.mean_s == pytest.approx(sum(lat) / len(lat), rel=1e-12)
    import numpy as np

    assert got.p50_s == pytest.approx(np.percentile(lat, 50), rel=1e-12)
    assert got.p90_s == pytest.approx(np.percentile(lat, 90), rel=1e-12)


def _mk_events(spark, rows):
    # (user_id, ts_micros, value) -> events-shaped frame with timestamp ts
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        rows, "user_id long, us long, value double"
    ).select("user_id", F.timestamp_micros(F.col("us")).alias("ts"), "value")


def test_cuped_degenerate_preperiod_falls_back_to_raw(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.abtest import cuped_report

    # identical pre-period for every user -> var_x = 0 -> theta must be 0
    # and CUPED must equal the raw comparison, not NaN
    rows = []
    for u in range(20):
        rows.append((u, 1_000_000, 100.0))            # pre (same for all)
        rows.append((u, 9_000_000, 50.0 + u))          # post varies
    out = cuped_report(_mk_events(spark, rows)).collect()[0]
    assert out.theta == 0.0
    assert out.variance_reduction == 0.0
    assert out.delta_cuped == out.delta_raw
    assert out.cuped_mean_a == out.mean_y_a


def test_cuped_strong_covariate_recovers_effect(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.abtest import (
        ab_assignment,
        cuped_report,
    )

    # persistent per-user level: post = pre + 5 for variant B, +0 for A.
    # CUPED should drive theta ~ 1 and pull delta_cuped toward the true
    # effect even when user levels are imbalanced across variants.
    events = _mk_events(
        spark, [(u, 1_000_000, 100.0 + 7.0 * u) for u in range(40)]
    )
    variants = {
        r.user_id: r.variant for r in ab_assignment(events).collect()
    }
    rows = []
    for u in range(40):
        pre = 100.0 + 7.0 * u
        rows.append((u, 1_000_000, pre))
        rows.append((u, 9_000_000, pre + (5.0 if variants[u] == "B" else 0.0)))
    out = cuped_report(_mk_events(spark, rows)).collect()[0]
    assert 0.9 < out.theta < 1.1
    assert out.variance_reduction > 0.5
    assert abs(out.delta_cuped - 5.0) <= abs(out.delta_raw - 5.0) + 1e-9
    assert abs(out.delta_cuped - 5.0) < 1.0


def test_cuped_excludes_null_users(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.abtest import cuped_report

    rows = [(u, 1_000_000, 10.0) for u in range(10)] + [
        (u, 9_000_000, 20.0) for u in range(10)
    ]
    base = _mk_events(spark, rows)
    with_null = base.unionByName(
        _mk_events(spark, [(None, 1_000_000, 999.0), (None, 9_000_000, 999.0)])
    )
    a = cuped_report(base).collect()[0]
    b = cuped_report(with_null).collect()[0]
    assert a.n_users == b.n_users == 10
    assert a.mean_y_a == b.mean_y_a and a.mean_y_b == b.mean_y_b
