"""k-core pinned against hand-built graphs and a pure-Python peel over
the fixture co-occurrence graph."""

from itertools import combinations

import pytest

from pipeline_pyspark_etl_imdb_spark.operators import triangles
from pipeline_pyspark_etl_imdb_spark.operators.kcore import k_core
from tests.conftest import SF_SMOKE


def _python_k_core(edge_set: set, k: int) -> dict:
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


def test_k4_plus_tail_peels_the_tail(spark):
    # K4 (0-3) with a pendant path 3-4-5: 3-core = the K4 only
    edges = [(a, b) for a, b in combinations(range(4), 2)] + [(3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: r.degree for r in k_core(df, k=3).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_no_core_returns_empty(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src int, dst int")
    assert k_core(df, k=3).count() == 0


def test_cascading_peel(spark):
    # triangle 0-1-2 plus chain 2-3-4: k=2 keeps only the triangle
    # (4 peels first, then 3 — two rounds)
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)], "src int, dst int"
    )
    got = {r.node: r.degree for r in k_core(df, k=2).collect()}
    assert got == {0: 2, 1: 2, 2: 2}


def test_matches_python_reference_on_fixture(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    edges = triangles.cooccurrence_edges(li)
    edge_set = {(r.src, r.dst) for r in edges.collect()}
    for k in (2, 3, 4):
        want = _python_k_core(edge_set, k)
        got = {r.node: r.degree for r in k_core(edges, k=k).collect()}
        assert got == want, f"k={k}"
