"""Property tests: triangle participation and k-core must agree with
pure-Python references on randomized graphs — generated cases catch the
shapes the fixture can't (empty graphs, disconnected stars, graphs that
peel to nothing, self-contained cliques)."""

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pipeline_pyspark_etl_imdb_spark.operators.kcore import k_core
from pipeline_pyspark_etl_imdb_spark.operators.triangles import (
    triangle_participation,
)
from pipeline_pyspark_etl_imdb_spark.operators.util import release_tracked

edge = st.tuples(
    st.integers(min_value=0, max_value=7), st.integers(min_value=0, max_value=7)
)


def _canon(edges):
    return {(min(a, b), max(a, b)) for a, b in edges if a != b}


def _py_triangles(edge_set):
    count: dict = {}
    for a, b, c in combinations(sorted({n for e in edge_set for n in e}), 3):
        if (a, b) in edge_set and (b, c) in edge_set and (a, c) in edge_set:
            for n in (a, b, c):
                count[n] = count.get(n, 0) + 1
    return count


def _py_k_core(edge_set, k):
    adj: dict = {}
    for a, b in edge_set:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(ns) for n, ns in adj.items() if ns}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=st.lists(edge, min_size=1, max_size=20))
def test_triangles_match_python(spark, edges):
    es = _canon(edges)
    if not es:
        return
    df = spark.createDataFrame(sorted(es), "src int, dst int")
    try:
        got = {
            r.node: r.n_triangles for r in triangle_participation(df).collect()
        }
    finally:
        release_tracked()
    assert got == _py_triangles(es)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(edge, min_size=1, max_size=20),
    k=st.integers(min_value=1, max_value=4),
)
def test_k_core_matches_python(spark, edges, k):
    es = _canon(edges)
    if not es:
        return
    df = spark.createDataFrame(sorted(es), "src int, dst int")
    got = {r.node: r.degree for r in k_core(df, k=k).collect()}
    assert got == _py_k_core(es, k)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["cat", "dog", "fish", "bird", "ant"]),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=8,
    ),
    query=st.sets(
        st.sampled_from(["cat", "dog", "fish"]), min_size=1, max_size=3
    ),
)
def test_bm25_matches_python(spark, docs, query):
    import math

    from pipeline_pyspark_etl_imdb_spark.operators.text import bm25_scores

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.n_matched, r.score)
        for r in bm25_scores(df, sorted(query)).collect()
    }
    # pure-Python Okapi BM25, Lucene +1 idf, k1=1.2 b=0.75
    n = len(docs)
    dls = [len(t) for t in docs]
    avgdl = sum(dls) / n
    dfreq = {
        t: sum(1 for d in docs if t in d) for t in query
    }
    want = {}
    for i, d in enumerate(docs):
        score, matched = 0.0, 0
        for t in sorted(query):
            tf = d.count(t)
            if tf == 0:
                continue
            matched += 1
            idf = math.log((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0)
            score += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dls[i] / avgdl))
        if matched:
            want[i] = (matched, score)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0]
        assert abs(got[i][1] - want[i][1]) < 1e-9, i


def _py_bfs(edge_set, seeds, max_hops):
    adj: dict = {}
    for a, b in edge_set:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = sorted(dist)
    for h in range(1, max_hops + 1):
        nxt = sorted(
            {v for u in frontier for v in adj.get(u, ()) if v not in dist}
        )
        for v in nxt:
            dist[v] = h
        frontier = nxt
    return dist


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(edge, min_size=1, max_size=20),
    max_hops=st.integers(min_value=1, max_value=5),
    n_seeds=st.integers(min_value=1, max_value=3),
)
def test_bfs_hops_matches_python(spark, edges, max_hops, n_seeds):
    from pipeline_pyspark_etl_imdb_spark.operators.components import bfs_hops

    es = _canon(edges)
    if not es:
        return
    nodes = sorted({n for e in es for n in e})
    seeds = nodes[:n_seeds]
    df = spark.createDataFrame(sorted(es), "src int, dst int")
    seed_df = spark.createDataFrame([(s,) for s in seeds], "node int")
    try:
        got = {
            r.node: r.hops
            for r in bfs_hops(df, seeds=seed_df, max_hops=max_hops).collect()
        }
    finally:
        release_tracked()
    assert got == _py_bfs(es, seeds, max_hops)


# --- r9: the graph-path family (weighted SSSP, label-budget BFS) ----------


from pipeline_pyspark_etl_imdb_spark.operators.components import (  # noqa: E402
    bfs_label_budget,
    sssp_bounded,
)

wedge_st = st.tuples(
    st.integers(min_value=0, max_value=7),
    st.integers(min_value=0, max_value=7),
    st.integers(min_value=1, max_value=9),
)


def _canon_w(edges):
    # canonical undirected weighted edges; on duplicates keep the MIN
    # weight (mirrors what a groupBy-min edge build would produce)
    out: dict = {}
    for a, b, w in edges:
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        out[k] = min(out.get(k, w), w)
    return [(a, b, w) for (a, b), w in sorted(out.items())]


def _py_sssp_rounds(edges, n_rounds):
    adj: dict = {}
    for u, v, w in edges:
        adj.setdefault(u, []).append((v, w))
        adj.setdefault(v, []).append((u, w))
    if not adj:
        return {}
    dist = {min(adj): 0}
    for _ in range(n_rounds):
        nxt = dict(dist)
        for u, d in dist.items():
            for v, w in adj.get(u, ()):
                if v not in nxt or d + w < nxt[v]:
                    nxt[v] = d + w
        dist = nxt
    return dist


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(wedge_st, min_size=1, max_size=16),
    n_rounds=st.integers(min_value=1, max_value=4),
)
def test_sssp_bounded_matches_python(spark, edges, n_rounds):
    es = _canon_w(edges)
    if not es:
        return
    df = spark.createDataFrame(es, "src int, dst int, w int")
    try:
        got = {
            r.node: r.dist
            for r in sssp_bounded(df, n_rounds=n_rounds).collect()
        }
    finally:
        release_tracked()
    assert got == _py_sssp_rounds(es, n_rounds)


def _py_label_rounds(edges, max_weak, max_hops):
    adj: dict = {}
    for u, v, wk in edges:
        adj.setdefault(u, []).append((v, wk))
        adj.setdefault(v, []).append((u, wk))
    if not adj:
        return {}
    seed = min(adj)
    seen = {(seed, 0): 0}
    frontier = [(seed, 0)]
    for h in range(1, max_hops + 1):
        nxt = []
        for u, w in frontier:
            for v, wk in adj.get(u, ()):
                s = (v, w + wk)
                if s[1] <= max_weak and s not in seen:
                    seen[s] = h
                    nxt.append(s)
        frontier = nxt
    best: dict = {}
    for (node, w), h in seen.items():
        if node not in best or (h, w) < best[node]:
            best[node] = (h, w)
    return best


labeled_edge = st.tuples(
    st.integers(min_value=0, max_value=7),
    st.integers(min_value=0, max_value=7),
    st.integers(min_value=0, max_value=1),
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(labeled_edge, min_size=1, max_size=16),
    max_weak=st.integers(min_value=0, max_value=2),
    max_hops=st.integers(min_value=1, max_value=4),
)
def test_bfs_label_budget_matches_python(spark, edges, max_weak, max_hops):
    # canonical: on duplicate pairs keep the STRONG label (min is_weak),
    # matching a groupBy-min edge build
    canon: dict = {}
    for a, b, wk in edges:
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        canon[k] = min(canon.get(k, wk), wk)
    es = [(a, b, wk) for (a, b), wk in sorted(canon.items())]
    if not es:
        return
    df = spark.createDataFrame(es, "src int, dst int, is_weak int")
    try:
        got = {
            r.node: (r.hops, r.weak_used)
            for r in bfs_label_budget(
                df, max_weak=max_weak, max_hops=max_hops
            ).collect()
        }
    finally:
        release_tracked()
    assert got == _py_label_rounds(es, max_weak, max_hops)
