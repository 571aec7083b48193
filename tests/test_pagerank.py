"""PageRank gates: the distributed loop must reproduce an independent
NumPy power iteration exactly (same synchronous update, dangling
redistribution, and teleport), conserve total mass, and keep its
per-round plan O(1) via checkpoint truncation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.pagerank import pagerank

# a graph with a hub, a cycle, a dangling node (5) and a disconnected
# pair (6->7) — exercises every mass path
EDGES = [
    (0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (4, 2), (2, 5),
    (6, 7),
]
DAMPING = 0.85
N_ITER = 10


def _numpy_pagerank(edges, n_iter=N_ITER, d=DAMPING):
    nodes = sorted({u for e in edges for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[idx[t]] += r[idx[s]] / out_deg[idx[s]]
        dangling = r[out_deg == 0].sum() / n
        r = (1.0 - d) / n + d * (contrib + dangling)
    return {v: r[idx[v]] for v in nodes}


@pytest.fixture(scope="module")
def ranks(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    return {r["node"]: r["rank"] for r in pagerank(edges).collect()}


def test_pagerank_matches_numpy(ranks):
    expected = _numpy_pagerank(EDGES)
    assert set(ranks) == set(expected)
    for v, exp in expected.items():
        assert ranks[v] == pytest.approx(exp, abs=1e-12), f"node {v}"


def test_pagerank_mass_conserved(ranks):
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_orders_hub_first(ranks):
    # node 2 receives from 0,1,3,4 — must outrank every other node
    assert ranks[2] == max(ranks.values())
