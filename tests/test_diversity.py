"""kcenter_select pinned against an independent pure-NumPy greedy
farthest-point reference (same seed rule, same tie-breaks), plus the
greedy invariants. The registry exposure is rows-only (NumPy kernel
summation order is not SQL-portable), so this reference IS the
correctness gate."""

import hashlib

import numpy as np

from pipeline_pyspark_etl_imdb_spark.operators.diversity import kcenter_select
from tests.conftest import SF_ORACLE


def _numpy_kcenter(ids, X, k):
    h = [hashlib.md5(f"{i}:kcenter".encode()).hexdigest() for i in ids]
    seed_pos = min(range(len(ids)), key=lambda p: (h[p], ids[p]))
    picks = [(0, ids[seed_pos], 0.0)]
    centers = [X[seed_pos]]
    chosen = {seed_pos}
    for order in range(1, min(k, len(ids))):
        d = ((X[:, None, :] - np.stack(centers)[None, :, :]) ** 2).sum(axis=2).min(axis=1)
        best = None
        for p in range(len(ids)):
            if p in chosen:
                continue
            key = (-d[p], ids[p])
            if best is None or key < best[0]:
                best = (key, p)
        p = best[1]
        picks.append((order, ids[p], float(d[p])))
        centers.append(X[p])
        chosen.add(p)
    return picks


def test_kcenter_matches_numpy_reference(spark):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    rows = emb.orderBy("vec_id").collect()
    ids = [r.vec_id for r in rows]
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    want = _numpy_kcenter(ids, X, k=8)
    got = [
        (r.pick_order, r.vec_id, r.sq_dist_at_pick)
        for r in kcenter_select(emb, k=8).orderBy("pick_order").collect()
    ]
    assert [(o, i) for o, i, _ in got] == [(o, i) for o, i, _ in want]
    for (_, _, dg), (_, _, dw) in zip(got, want):
        assert abs(dg - dw) <= 1e-9 * max(1.0, dw)


def test_kcenter_greedy_invariants(spark):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    out = kcenter_select(emb, k=6).orderBy("pick_order").collect()
    assert len(out) == 6
    assert len({r.vec_id for r in out}) == 6
    # farthest-point radii are non-increasing after the seed
    dists = [r.sq_dist_at_pick for r in out[1:]]
    assert all(a >= b for a, b in zip(dists, dists[1:]))


def test_kcenter_k_exceeds_n(spark):
    emb = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 2.0])],
        "vec_id long, embedding array<float>",
    )
    out = kcenter_select(emb, k=10).collect()
    assert len(out) == 3
    assert {r.vec_id for r in out} == {1, 2, 3}
