"""CUSUM change-points, time-decayed engagement, and event-type k-gram
mining: pinned against pure-Python references on the smoke fixture, plus
physical-plan gates (single user Exchange for CUSUM, TakeOrdered for the
k-gram top-N, partial agg for the decay sum)."""

import pytest
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators import eventtime, journeys
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{SF_SMOKE}/events.parquet")


@pytest.fixture(scope="module")
def rows(spark, events):
    return (
        events.select(
            "user_id",
            "event_id",
            "event_type",
            eventtime.ts_micros(events).alias("us"),
            "value",
        )
        .collect()
    )


def test_cusum_matches_python(events, rows):
    mean = sum(r.value for r in rows) / len(rows)  # floats are benign here:
    # the reference only needs to agree on WHICH event peaks, and the
    # fixture's peaks are not within float-noise of each other
    by_user: dict = {}
    for r in sorted(rows, key=lambda r: (r.us, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r)
    want = {}
    for u, evs in by_user.items():
        c, best = 0.0, None
        for r in evs:
            c += r.value - mean
            if best is None or abs(c) > best[0] + 1e-9:
                best = (abs(c), r.event_id, r.us)
        want[u] = best
    got = {
        r.user_id: (r.max_abs_cusum, r.cp_event_id, r.cp_us)
        for r in eventtime.cusum_changepoints(events).collect()
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u][1] == want[u][1], u
        assert got[u][0] == pytest.approx(want[u][0], abs=1e-6)


def test_cusum_single_user_exchange(events):
    plan = (
        eventtime.cusum_changepoints(events)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # both windows and the rank filter ride ONE hashpartitioning(user_id)
    # Exchange; the global mean enters via a 1-row broadcast
    assert plan.count("hashpartitioning(user_id") == 1
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_decayed_value_matches_python(events, rows):
    max_us = max(r.us for r in rows)
    want: dict = {}
    for r in rows:
        age = (max_us - r.us) / 86400e6
        want[r.user_id] = want.get(r.user_id, 0.0) + r.value / (1.0 + age / 7.0)
    got = {
        r.user_id: r.decayed_value
        for r in eventtime.decayed_user_value(events, horizon_days=7.0).collect()
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u] == pytest.approx(want[u], rel=1e-9)


def test_decay_weights_recent_over_old(spark):
    ev = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:00:00", 10.0), (2, 2, "2024-01-08 00:00:00", 10.0)],
        "user_id long, event_id long, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r.user_id: r.decayed_value
        for r in eventtime.decayed_user_value(ev, horizon_days=7.0).collect()
    }
    assert got[2] == pytest.approx(10.0)  # at the corpus max -> no decay
    assert got[1] == pytest.approx(5.0)  # 7 days old at h=7 -> halved


def test_trigrams_match_python(events, rows):
    by_user: dict = {}
    for r in sorted(rows, key=lambda r: (r.us, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r.event_type)
    counts: dict = {}
    for seq in by_user.values():
        for i in range(len(seq) - 2):
            g = ">".join(seq[i : i + 3])
            counts[g] = counts.get(g, 0) + 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r.kgram, r.n_occurrences)
        for r in journeys.type_kgrams(events, k=3, top=20).collect()
    ]
    assert got == want


def test_trigrams_plan_take_ordered(events):
    plan = (
        journeys.type_kgrams(events, k=3, top=20)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan  # map-side combine before the shuffle


def test_value_bands_match_numpy(events, rows):
    import numpy as np

    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.value)
    got = {r.event_type: r for r in eventtime.value_percentile_bands(events).collect()}
    assert set(got) == set(by_type)
    for t, vals in by_type.items():
        a = np.array(vals)
        assert got[t].n_events == len(vals)
        assert got[t].mean_value == pytest.approx(a.mean(), rel=1e-12)
        # numpy 'linear' interpolation == SQL quantile_cont == Spark percentile
        for p, col in [(50, "p50"), (90, "p90"), (99, "p99")]:
            assert getattr(got[t], col) == pytest.approx(
                np.percentile(a, p), rel=1e-12
            ), (t, p)


def test_dow_seasonality_properties(spark, events):
    out = eventtime.dow_seasonality(events).collect()
    # weighted mean of seasonal indexes over each type's week == 1.0
    by_type: dict = {}
    for r in out:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        n = sum(r.n_events for r in rs)
        w = sum(r.seasonal_index * r.n_events for r in rs) / n
        assert w == pytest.approx(1.0, rel=1e-9), t
        assert all(0 <= r.dow <= 6 for r in rs)


def test_dow_is_monday_zero(spark):
    # 2024-01-01 was a Monday
    ev = spark.createDataFrame(
        [(1, 1, "2024-01-01 12:00:00", "view", 1.0),
         (2, 1, "2024-01-07 12:00:00", "view", 1.0)],
        "event_id long, user_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = sorted(r.dow for r in eventtime.dow_seasonality(ev).collect())
    assert got == [0, 6]  # Monday=0, the following Sunday=6


def test_km_retention_matches_product_limit_reference(spark):
    # lifetimes in days: 0,0,1,1(c),2; censor 2 users at the edge by
    # giving them last events inside the censor window
    rows = []
    eid = 0
    # (user, first_day, last_day)
    spec = [(1, 0, 0), (2, 0, 0), (3, 0, 1), (4, 0, 1), (5, 0, 2), (6, 0, 2)]
    for u, f_, l_ in spec:
        for dday in {f_, l_}:
            rows.append(
                (eid, u, f"2024-01-{dday + 1:02d} 12:00:00", "view", 0.0)
            )
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    # censor window 12 h: only users 5,6 (last event == corpus max)
    # censor; users 3,4 sit a full day before the edge (the window
    # boundary is INCLUSIVE, so a 1-day window would censor them too)
    got = {
        r.day: (r.n_risk, r.n_events, r.n_censored, r.survival)
        for r in eventtime.km_retention(ev, censor_window_s=43200).collect()
    }
    # day 0: risk 6, events 2 -> S = 2/3; day 1: risk 4, events 2 -> S = 1/3
    # day 2: risk 2, events 0, censored 2 -> S stays 1/3
    assert got[0] == (6, 2, 0, pytest.approx(2 / 3))
    assert got[1] == (4, 2, 0, pytest.approx(2 / 3 * 0.5))
    assert got[2][0:3] == (2, 0, 2)
    assert got[2][3] == pytest.approx(1 / 3)


def test_seasonal_decomposition_catches_spike_not_weekday_dip(spark, tmp_path):
    """A recurring Monday dip lands in the seasonal component; a one-off
    spike lands in the residual — the seasonal-adjusted anomaly story."""
    import datetime

    from pipeline_pyspark_etl_imdb_spark.plans import analytics

    base = datetime.date(2024, 1, 1)  # a Monday
    rows = []
    oid = 0
    for d in range(56):  # 8 full weeks
        day = base + datetime.timedelta(days=d)
        total = 100.0 - (40.0 if day.weekday() == 0 else 0.0)
        if d == 30:
            total += 500.0  # the one-off spike
        oid += 1
        rows.append((oid, day, total))
    df = spark.createDataFrame(rows, "o_orderkey long, o_orderdate date, o_totalprice double")
    path = str(tmp_path / "orders.parquet")
    df.write.parquet(path)
    out = {
        r.day: r
        for r in analytics.revenue_seasonal_decomposition(
            spark, str(tmp_path)
        ).collect()
    }
    # identity holds everywhere
    for r in out.values():
        assert abs(r.total - (r.trend + r.seasonal + r.residual)) < 1e-9
    # Mondays away from the spike: the dip is SEASONAL, residual ~ 0
    monday = (base + datetime.timedelta(days=7)).isoformat()
    assert out[monday].seasonal < -20.0
    assert abs(out[monday].residual) < 15.0
    # the spike day carries a large positive residual
    spike = (base + datetime.timedelta(days=30)).isoformat()
    assert out[spike].residual > 300.0


def test_markov_entropy_rate_hand_built(spark):
    import math

    from pipeline_pyspark_etl_imdb_spark.operators.journeys import (
        markov_entropy_rate,
    )

    # user 1: deterministic a->b->a->b (entropy 0); user 2: a->a->b from a
    rows = []
    for i, t in enumerate(["a", "b", "a", "b", "a"]):
        rows.append((1, i, t))
    for i, t in enumerate(["a", "a", "b", "a", "a", "b"]):
        rows.append((2, 100 + i, t))
    import datetime as dt

    base = dt.datetime(2020, 1, 1)
    df = spark.createDataFrame(
        [(u, e, t, base + dt.timedelta(seconds=e)) for u, e, t in rows],
        "user_id long, event_id long, event_type string, ts timestamp",
    )
    got = markov_entropy_rate(df).collect()[0]
    # transitions: u1: ab,ba,ab,ba ; u2: aa,ab,ba,aa,ab
    # counts: a->b:4, b->a:3, a->a:2 ; from a:6, from b:3 ; N=9
    n = {("a", "b"): 4, ("b", "a"): 3, ("a", "a"): 2}
    n_from = {"a": 6, "b": 3}
    N = 9
    h = -sum((c / N) * math.log(c / n_from[f]) for (f, _t), c in n.items())
    assert got.n_transitions == N and got.n_states == 2
    assert got.entropy_rate_nats == pytest.approx(h, rel=1e-12)
    assert got.normalized_entropy == pytest.approx(h / math.log(2), rel=1e-12)


def test_burstiness_clockwork_and_bursty(spark):
    import datetime as dt

    from pipeline_pyspark_etl_imdb_spark.operators.journeys import user_burstiness

    base = dt.datetime(2020, 1, 1)
    rows = []
    # user 1: perfectly periodic (sigma=0 -> B=-1)
    for i in range(5):
        rows.append((1, i, base + dt.timedelta(seconds=10 * i)))
    # user 2: gaps 1s,1s,1000s -> bursty (B>0? mu=334, sigma~471 -> B>0)
    for i, s in enumerate([0, 1, 2, 1002]):
        rows.append((2, 100 + i, base + dt.timedelta(seconds=s)))
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    got = user_burstiness(df).collect()[0]
    assert got.n_users == 2
    assert got.min_burstiness == pytest.approx(-1.0)
    assert got.max_burstiness > 0
    assert got.share_bursty == pytest.approx(0.5)


def test_hhi_extremes(spark, tmp_path):
    from pipeline_pyspark_etl_imdb_spark.plans.analytics import (
        parttype_supplier_hhi,
    )

    li = spark.createDataFrame(
        # type via part join below; monopoly part 1, even-split part 2
        [
            (1, 1, 10, 100.0, 0.0),
            (2, 1, 10, 50.0, 0.0),
            (3, 2, 20, 30.0, 0.0),
            (4, 2, 21, 30.0, 0.0),
            (5, 2, 22, 30.0, 0.0),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_extendedprice double, l_discount double",
    )
    part = spark.createDataFrame(
        [(1, "MONO TYPE"), (2, "SPLIT TYPE")], "p_partkey long, p_type string"
    )
    li.write.parquet(str(tmp_path / "lineitem.parquet"))
    part.write.parquet(str(tmp_path / "part.parquet"))
    rows = {r.p_type: r for r in parttype_supplier_hhi(spark.sparkContext and spark, str(tmp_path)).collect()}
    assert rows["MONO TYPE"].hhi == pytest.approx(1.0)
    assert rows["MONO TYPE"].n_suppliers == 1
    assert rows["SPLIT TYPE"].hhi == pytest.approx(1 / 3)
    assert rows["SPLIT TYPE"].effective_suppliers == pytest.approx(3.0)


def test_decile_lift_perfect_separation(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.evalmetrics import (
        decile_lift_table,
    )

    # 100 rows, top-20 scores are the only positives -> tiles 1-2 capture all
    rows = [(i, 100.0 - i, 1 if i < 20 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, score double, y int")
    t = {r.tile: r for r in decile_lift_table(df, "score", "y", "id").collect()}
    assert t[1].n == 10 and t[1].n_pos == 10
    assert t[1].lift == pytest.approx(5.0)  # 1.0 / 0.2 base
    assert t[2].cum_capture == pytest.approx(1.0)
    assert t[3].n_pos == 0 and t[10].cum_capture == pytest.approx(1.0)


def test_compression_ratio_pinned_against_zlib(spark):
    import zlib

    from pipeline_pyspark_etl_imdb_spark.operators.text import compression_ratio

    docs = spark.createDataFrame(
        [
            (1, "spam " * 500),          # highly repetitive -> tiny ratio
            (2, "Analytics engines trade memory for parallelism whenever shuffles dominate the plan, because every exchange writes sorted runs to disk before reducers fetch them; careful partitioning, broadcast dimensions, and salted keys keep those transfers bounded while adaptive execution repairs skew at runtime."),
            (3, ""),                      # empty -> NULL ratio, no div0
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in compression_ratio(docs).collect()}
    for did, text in [(1, "spam " * 500), (2, "Analytics engines trade memory for parallelism whenever shuffles dominate the plan, because every exchange writes sorted runs to disk before reducers fetch them; careful partitioning, broadcast dimensions, and salted keys keep those transfers bounded while adaptive execution repairs skew at runtime.")]:
        b = text.encode("utf-8")
        assert rows[did].raw_bytes == len(b)
        assert rows[did].compressed_bytes == len(zlib.compress(b, 6))
        assert rows[did].ratio == pytest.approx(
            len(zlib.compress(b, 6)) / len(b), rel=1e-12
        )
    assert rows[1].ratio < 0.05 and rows[1].keep_flag is False
    assert rows[2].keep_flag is True
    # empty doc: ratio undefined (NULL) but the flag is an explicit
    # False — a NULL flag would silently vanish from BOTH keep_flag and
    # NOT keep_flag filters downstream (ADVICE r4)
    assert rows[3].ratio is None and rows[3].keep_flag is False
