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
