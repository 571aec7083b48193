"""Property tests for the late-round operators: randomized inputs vs
brute-force Python references — conservation laws and exact-count
contracts that example tests can't sweep."""

from itertools import combinations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators import triangles
from pipeline_pyspark_etl_imdb_spark.operators.attribution import (
    position_based_attribution,
)
from pipeline_pyspark_etl_imdb_spark.operators.basket import association_rules

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

event = st.tuples(
    st.integers(min_value=0, max_value=3),  # user
    st.integers(min_value=0, max_value=100),  # offset seconds
    st.sampled_from(["view", "click", "purchase"]),
    st.integers(min_value=0, max_value=50),  # value
)


@settings(**SETTINGS)
@given(events=st.lists(event, min_size=1, max_size=25))
def test_attribution_conserves_purchase_value(spark, events):
    df = spark.createDataFrame(
        [
            (i, u, f"2024-01-01 00:{off // 60:02d}:{off % 60:02d}", t, float(v))
            for i, (u, off, t, v) in enumerate(events)
        ],
        "event_id long, user_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = position_based_attribution(df, lookback_s=3600).collect()
    total_purchases = sum(float(v) for (_, _, t, v) in events if t == "purchase")
    total_credited = sum(r.attributed_value for r in out)
    assert total_credited == pytest.approx(total_purchases, abs=1e-9)


basket_row = st.tuples(
    st.integers(min_value=0, max_value=5),  # order
    st.integers(min_value=0, max_value=6),  # item
)


@settings(**SETTINGS)
@given(rows=st.lists(basket_row, min_size=1, max_size=25))
def test_association_rules_match_bruteforce(spark, rows):
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = {
        (r.item_a, r.item_b): (r.n_ab, r.n_a, r.n_b)
        for r in association_rules(df, min_support=1, top_n=1000).collect()
    }
    baskets: dict = {}
    for o, i in set(rows):
        baskets.setdefault(o, set()).add(i)
    item_count: dict = {}
    for items in baskets.values():
        for i in items:
            item_count[i] = item_count.get(i, 0) + 1
    want: dict = {}
    for items in baskets.values():
        for a, b in combinations(sorted(items), 2):
            want[(a, b)] = want.get((a, b), (0,))[0] + 1, item_count[a], item_count[b]
    assert got == want


edge = st.tuples(
    st.integers(min_value=0, max_value=6), st.integers(min_value=0, max_value=6)
)


@settings(**SETTINGS)
@given(raw=st.lists(edge, min_size=1, max_size=15))
def test_link_prediction_matches_bruteforce(spark, raw):
    edges = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    if not edges:
        return
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {
        (r.u, r.v): (r.common, r.jaccard)
        for r in triangles.common_neighbor_links(df, top_n=1000).collect()
    }
    from pipeline_pyspark_etl_imdb_spark.operators.util import release_tracked

    release_tracked()
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for u, v in combinations(sorted(adj), 2):
        if (u, v) in edges:
            continue
        c = len(adj[u] & adj[v])
        if c:
            want[(u, v)] = (c, c / (len(adj[u]) + len(adj[v]) - c))
    assert set(got) == set(want)
    for k, (c, j) in want.items():
        assert got[k][0] == c
        assert got[k][1] == pytest.approx(j)


@settings(**SETTINGS)
@given(
    xs=st.lists(st.integers(min_value=-(10**9), max_value=10**9), min_size=1, max_size=40),
    kfrac=st.floats(min_value=0.0, max_value=1.0),
)
def test_exact_kth_matches_sorted_order_statistic(spark, xs, kfrac):
    from pipeline_pyspark_etl_imdb_spark.operators.selection import exact_kth

    k = 1 + int(kfrac * (len(xs) - 1))
    vals = spark.createDataFrame([(int(x),) for x in xs], "c bigint")
    assert exact_kth(vals, k) == sorted(xs)[k - 1]


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-(10**6), max_value=10**6),  # value (cents-free)
            st.integers(min_value=0, max_value=9),  # weight (0 = dropped)
        ),
        min_size=1,
        max_size=30,
    )
)
def test_weighted_median_matches_bruteforce_property(spark, rows):
    from pipeline_pyspark_etl_imdb_spark.operators.selection import (
        weighted_exact_median_report,
    )

    df = spark.createDataFrame(
        [(float(v), float(w)) for v, w in rows], "v double, w double"
    )
    out = weighted_exact_median_report(df, "v", "w", cents=False).collect()
    kept = sorted((v, w) for v, w in rows if w > 0)
    if not kept:
        assert out == []
        return
    W = sum(w for _, w in kept)
    k, cum = (W + 1) // 2, 0
    for v, w in kept:
        cum += w
        if cum >= k:
            want = float(v)
            break
    got = out[0]
    assert got.weighted_median == want
    assert got.total_weight == W and got.n_rows == len(kept)


# --- round-4 session additions: invariant properties ---------------------


def test_acf_bounded_and_lag0_identity(spark, tmp_path):
    """|r_k| <= 1 for all lags on an arbitrary deterministic series (by
    Cauchy-Schwarz on the global-mean-centered products)."""
    import datetime as dt

    from pipeline_pyspark_etl_imdb_spark.plans.analytics import daily_revenue_acf

    base = dt.date(2022, 3, 1)
    data = [
        (
            dt.datetime.combine(base + dt.timedelta(days=i), dt.time()),
            float((i * 7919) % 1000) + 0.25 * i,
        )
        for i in range(90)
    ]
    df = spark.createDataFrame(data, "o_orderdate timestamp, o_totalprice double")
    df.write.parquet(str(tmp_path / "orders.parquet"))
    rows = daily_revenue_acf(spark, str(tmp_path), max_lag=10).collect()
    assert len(rows) == 10
    for r in rows:
        assert abs(r.acf) <= 1.0 + 1e-12
        assert r.n_pairs == 90 - r.lag


def test_theilsen_shift_and_scale_equivariance(spark, tmp_path):
    """slope(a*y + b) == a*slope(y); intercept follows affinely — the
    defining equivariance of a median-of-slopes estimator."""
    import datetime as dt

    from pipeline_pyspark_etl_imdb_spark.plans.analytics import (
        theilsen_revenue_trend,
    )

    base = dt.date(2022, 1, 1)
    raw = [float((i * 31) % 17) + 2.0 * i for i in range(40)]

    def write(vals, path):
        data = [
            (dt.datetime.combine(base + dt.timedelta(days=i), dt.time()), v)
            for i, v in enumerate(vals)
        ]
        df = spark.createDataFrame(
            data, "o_orderdate timestamp, o_totalprice double"
        )
        df.write.parquet(str(path / "orders.parquet"))

    p1 = tmp_path / "a"
    p2 = tmp_path / "b"
    p1.mkdir()
    p2.mkdir()
    write(raw, p1)
    write([3.0 * v + 100.0 for v in raw], p2)
    r1 = theilsen_revenue_trend(spark, str(p1)).collect()[0]
    r2 = theilsen_revenue_trend(spark, str(p2)).collect()[0]
    assert r2.slope_per_day == pytest.approx(3.0 * r1.slope_per_day, rel=1e-9)
    assert r2.intercept == pytest.approx(
        3.0 * r1.intercept + 100.0, rel=1e-9
    )


def test_brier_decomposition_identity_and_bounds(spark):
    """brier == rel - res + unc + residual EXACTLY (the operator reports
    the residual rather than assuming it away), and every component is
    within its theoretical range."""
    from pipeline_pyspark_etl_imdb_spark.operators.evalmetrics import (
        brier_decomposition,
    )

    rows = [
        (((i * 131) % 997) / 997.0, 1 if (i * 17) % 5 < 2 else 0)
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "score double, y int")
    g = brier_decomposition(df, "score", "y", n_bins=10).collect()[0]
    assert 0.0 <= g.brier <= 1.0
    assert g.reliability >= -1e-12
    assert g.resolution >= -1e-12
    assert 0.0 <= g.uncertainty <= 0.25 + 1e-12
    assert g.brier == pytest.approx(
        g.reliability - g.resolution + g.uncertainty + g.within_bin_residual,
        abs=1e-12,
    )


def test_benford_chisq_zero_on_exact_benford_counts(spark):
    """Feeding counts proportional to log10(1+1/d) drives every chisq
    term to ~0 — the audit's null case."""
    import math

    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import (
        benford_digit_audit,
    )

    rows = []
    scale = 100000
    for d in range(1, 10):
        n_d = round(scale * math.log10(1 + 1 / d))
        rows.extend([(float(f"{d}23.45"),)] * n_d)
    df = spark.createDataFrame(rows, "amt double")
    out = benford_digit_audit(df, "amt").collect()
    for r in out:
        # counts are rounded to integers, so terms are near but not at 0
        assert r.chisq_term < 0.05


def test_assortativity_complete_graph_undefined_star_negative(spark):
    """K4 is degree-regular (zero variance -> NaN/NULL); a double star
    (two hubs joined) is assortative between hubs but dominated by
    hub-leaf edges -> negative."""
    import math

    from pipeline_pyspark_etl_imdb_spark.operators.triangles import (
        degree_assortativity,
    )

    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)],
        "src long, dst long",
    )
    g1 = degree_assortativity(k4).collect()[0]
    assert g1.assortativity is None or math.isnan(g1.assortativity)

    dstar = [(0, i) for i in range(2, 6)] + [(1, i) for i in range(6, 10)] + [(0, 1)]
    g2 = degree_assortativity(
        spark.createDataFrame(dstar, "src long, dst long")
    ).collect()[0]
    assert g2.assortativity < 0


def test_logodds_symmetry(spark):
    """Swapping the group indicator negates every z score."""
    from pyspark.sql import functions as F

    from pipeline_pyspark_etl_imdb_spark.operators.text import (
        distinctive_tokens_logodds,
    )

    rows = []
    for i in range(40):
        rows.append((i, "red apple pie" if i % 2 else "blue sky walk", i % 2))
    docs = spark.createDataFrame(rows, "doc_id long, text string, g int")
    a = {
        r.token: r.z_logodds
        for r in distinctive_tokens_logodds(
            docs, in_group=(F.col("g") == 1), top_k=50, min_count=1
        ).collect()
    }
    b = {
        r.token: r.z_logodds
        for r in distinctive_tokens_logodds(
            docs, in_group=(F.col("g") == 0), top_k=50, min_count=1
        ).collect()
    }
    for tok in a:
        assert a[tok] == pytest.approx(-b[tok], rel=1e-9)


def test_entropy_rate_bounds_on_arbitrary_stream(spark):
    """0 <= H <= ln(n_states) for any event stream (normalized in [0,1])."""
    import datetime as dt

    from pipeline_pyspark_etl_imdb_spark.operators.journeys import (
        markov_entropy_rate,
    )

    base = dt.datetime(2021, 6, 1)
    types = ["view", "click", "purchase", "error"]
    rows = [
        (i % 7, i, types[(i * i + 3 * i) % 4], base + dt.timedelta(seconds=i))
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp"
    )
    g = markov_entropy_rate(df).collect()[0]
    assert 0.0 <= g.entropy_rate_nats
    assert 0.0 <= g.normalized_entropy <= 1.0 + 1e-12


def test_burstiness_always_in_unit_interval(spark):
    """B in [-1, 1] by construction for every user mix."""
    import datetime as dt

    from pipeline_pyspark_etl_imdb_spark.operators.journeys import user_burstiness

    base = dt.datetime(2021, 6, 1)
    rows = []
    eid = 0
    for u in range(20):
        t = 0
        for i in range(3 + u % 5):
            t += 1 + ((u * 37 + i * i * 13) % 1000)
            rows.append((u, eid, base + dt.timedelta(seconds=t)))
            eid += 1
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    g = user_burstiness(df).collect()[0]
    assert -1.0 - 1e-12 <= g.min_burstiness
    assert g.max_burstiness <= 1.0 + 1e-12
    assert 0.0 <= g.share_bursty <= 1.0


def test_hhi_bounds_and_effective_suppliers(spark, tmp_path):
    """1/n <= HHI <= 1 and 1 <= effective_suppliers <= n for every type."""
    from pipeline_pyspark_etl_imdb_spark.plans.analytics import (
        parttype_supplier_hhi,
    )

    li_rows = []
    for k in range(60):
        li_rows.append(
            (k, 1 + k % 4, 10 + (k * k) % 7, 10.0 + (k * 31) % 500, 0.05)
        )
    li = spark.createDataFrame(
        li_rows,
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_extendedprice double, l_discount double",
    )
    part = spark.createDataFrame(
        [(1, "A T"), (2, "B T"), (3, "C T"), (4, "D T")],
        "p_partkey long, p_type string",
    )
    li.write.parquet(str(tmp_path / "lineitem.parquet"))
    part.write.parquet(str(tmp_path / "part.parquet"))
    for r in parttype_supplier_hhi(spark, str(tmp_path)).collect():
        assert 1.0 / r.n_suppliers - 1e-12 <= r.hhi <= 1.0 + 1e-12
        assert 1.0 - 1e-9 <= r.effective_suppliers <= r.n_suppliers + 1e-9


def test_decile_lift_conservation_and_monotone_capture(spark):
    """Tiles partition the population; cum_capture is monotone to 1.0;
    population-weighted lift averages to 1."""
    from pipeline_pyspark_etl_imdb_spark.operators.evalmetrics import (
        decile_lift_table,
    )

    rows = [
        (i, ((i * 131) % 997) / 997.0, 1 if (i * 7) % 3 == 0 else 0)
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "id long, score double, y int")
    t = sorted(
        decile_lift_table(df, "score", "y", "id").collect(), key=lambda r: r.tile
    )
    assert sum(r.n for r in t) == 500
    assert sum(r.n_pos for r in t) == sum(y for _, _, y in rows)
    caps = [r.cum_capture for r in t]
    assert all(a <= b + 1e-12 for a, b in zip(caps, caps[1:]))
    assert caps[-1] == pytest.approx(1.0)
    wavg_lift = sum(r.lift * r.n for r in t) / 500
    assert wavg_lift == pytest.approx(1.0, rel=1e-9)
