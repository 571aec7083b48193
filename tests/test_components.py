"""Connected components on hand-built graphs: chains (multi-hop
propagation), separate components, and canonical-survivor selection."""

import pytest

from pipeline_pyspark_etl_imdb_spark.operators.components import (
    connected_components,
    dedup_canonical,
)


def test_chain_and_disjoint_components(spark):
    # 1-2-3-4 chain (diameter > 1 forces multiple propagation rounds),
    # {10, 11} pair, and 20-21-22 triangle
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a long, doc_b long",
    )
    got = {r.node: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_max_iter_guard(spark):
    edges = spark.createDataFrame([(i, i + 1) for i in range(10)], "doc_a long, doc_b long")
    with pytest.raises(RuntimeError):
        connected_components(edges, max_iter=1)


def test_dedup_canonical_keeps_min_and_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "doc_a long, doc_b long")
    kept = sorted(r.doc_id for r in dedup_canonical(docs, pairs).collect())
    # cluster {0,3,5} -> keep 0; singletons 1,2,4 kept
    assert kept == [0, 1, 2, 4]


def test_deep_graph_raises_instead_of_wrong_answer(spark):
    import pytest as _pytest

    from pipeline_pyspark_etl_imdb_spark.operators.components import (
        connected_components,
    )

    # a 60-node path needs ~O(length) min-label rounds — far past max_iter;
    # the guard must raise (the documented large-star/small-star escape
    # hatch) rather than return partially-propagated labels
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "doc_a long, doc_b long"
    )
    with _pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(edges, max_iter=5)


def test_label_propagation_matches_python_replay(spark):
    """Fixed-round synchronous LPA with (count desc, label asc) ties must
    equal the identical pure-Python replay — two cliques joined by one
    bridge edge resolve to two communities."""
    from collections import Counter

    from pipeline_pyspark_etl_imdb_spark.operators.components import (
        label_propagation,
    )

    # cliques {0,1,2,3} and {10,11,12,13}, bridge 3-10
    edges = []
    for grp in ([0, 1, 2, 3], [10, 11, 12, 13]):
        for i, a in enumerate(grp):
            for b in grp[i + 1:]:
                edges.append((a, b))
    edges.append((3, 10))
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    n_iter = 5
    got = {r.node: r.community for r in label_propagation(df, n_iter).collect()}

    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    labels = {v: v for v in adj}
    for _ in range(n_iter):
        new = {}
        for v, nbrs in adj.items():
            cnt = Counter(labels[u] for u in nbrs)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        labels = new
    assert got == labels
    # the two cliques end in different communities
    assert len({got[v] for v in (0, 1, 2)}) == 1
    assert len({got[v] for v in (11, 12, 13)}) == 1
    assert got[0] != got[11]


def test_label_propagation_rows_cover_all_nodes(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.components import (
        label_propagation,
    )

    path = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(path, "src long, dst long")
    out = label_propagation(df, n_iter=3).collect()
    assert len(out) == 31
    assert {r.node for r in out} == set(range(31))


def test_bfs_hops_path_graph(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.components import bfs_hops

    # path 0-1-2-...-10: default seed = min node (0), max_hops=4 reaches
    # exactly nodes 0..4 at their index distance
    path = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(path, "src long, dst long")
    got = {r.node: r.hops for r in bfs_hops(df, max_hops=4).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}


def test_bfs_hops_multi_seed_nearest(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.components import bfs_hops

    # seeds at both ends of a path of 11 nodes: hops = distance to the
    # NEAREST seed, frontier exhaustion mid-path is a no-op
    path = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(path, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (10,)], "node long")
    got = {r.node: r.hops for r in bfs_hops(df, seeds=seeds, max_hops=10).collect()}
    assert got == {i: min(i, 10 - i) for i in range(11)}


def test_bfs_hops_duplicate_and_isolated_seeds(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.components import bfs_hops

    # a caller-supplied seeds frame is untrusted: duplicated seed ids must
    # not duplicate (node, 0) rows, and a seed absent from the edge set
    # stays at hop 0 with no reachable neighbors (isolated-source contract)
    path = [(i, i + 1) for i in range(5)]
    df = spark.createDataFrame(path, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (0,), (0,), (99,)], "node long")
    rows = bfs_hops(df, seeds=seeds, max_hops=2).collect()
    assert len(rows) == len({r.node for r in rows}), "duplicate node rows"
    got = {r.node: r.hops for r in rows}
    assert got == {0: 0, 1: 1, 2: 2, 99: 0}


def test_bfs_hops_matches_python_on_cooccurrence(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.components import bfs_hops
    from pipeline_pyspark_etl_imdb_spark.operators.triangles import (
        cooccurrence_edges,
    )
    from tests.conftest import SF_SMOKE

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").where(
        "l_partkey % 4 = 0"
    )
    edges = cooccurrence_edges(li)
    adj: dict = {}
    for r in edges.collect():
        adj.setdefault(r.src, set()).add(r.dst)
        adj.setdefault(r.dst, set()).add(r.src)
    source = min(adj)
    dist = {source: 0}
    frontier = [source]
    for h in range(1, 5):
        nxt = sorted(
            {v for u in frontier for v in adj[u] if v not in dist}
        )
        for v in nxt:
            dist[v] = h
        frontier = nxt
    got = {r.node: r.hops for r in bfs_hops(edges, max_hops=4).collect()}
    assert got == dist
