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
