"""Property tests for the k-means / k-center oracle CONSTRUCTIONS.

The fixture hash-greens (sf0.001/0.01/0.1) exercise the happy path of
`oracles._kmeans_assign_cte` / `oracles._kcenter_sql`, but never the
structural branches: clusters that lose every member (the COALESCE
keep-previous-centroid rule), corpora smaller than k (min(n, k) seeds /
early-stop picks), and exact distance ties from byte-identical vectors.
These tests run the ORACLE SQL in DuckDB over randomized small
integer-valued embedding frames and compare against an independent
pure-Python/NumPy replay of the operator semantics (the same replay
discipline as tests/test_kmeans.py / test_diversity.py, which pin the
SPARK side) — if the CTE unrolling mis-encodes seeding, tie-breaks,
empty-cluster keep, or the pick exclusion, it fails here on a shrunken
counterexample instead of as an opaque future hash mismatch.

Integer-valued vectors keep every distance sum exact in float64 until
the first centroid division, and generated cases with a sub-1e-6
nonzero assignment margin are discarded (hypothesis `assume`), so
association-order ulps can never flip a comparison — exact ties (from
duplicate vectors or symmetric configurations) remain exact in BOTH
engines and resolve through the same deterministic tie-break.
"""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np
import pandas as pd
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from pipeline_pyspark_etl_imdb_spark.plans.oracles import (
    _kcenter_sql,
    _kmeans_assign_cte,
)

# small integer grids make duplicate vectors and empty clusters COMMON
_vec = st.lists(st.integers(min_value=0, max_value=4), min_size=3, max_size=3)


def _frame(vecs: list[list[int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "vec_id": list(range(len(vecs))),
            "embedding": [[float(x) for x in v] for v in vecs],
        }
    )


def _seed_order(ids: np.ndarray, salt: str) -> np.ndarray:
    h = np.array([hashlib.md5(f"{int(i)}:{salt}".encode()).hexdigest() for i in ids])
    return np.lexsort((ids, h))


def _kmeans_replay(vecs: list[list[int]], k: int, n_iter: int):
    """Pure-NumPy replay of operators.kmeans.lloyd_kmeans's assignment
    semantics; returns (assignment list ordered by vec_id, min nonzero
    argmin margin across rounds)."""
    X = np.array(vecs, dtype=np.float64)
    ids = np.arange(len(vecs))
    order = _seed_order(ids, "kmeans")[: min(k, len(vecs))]
    seed_ids = np.sort(ids[order])
    C = X[seed_ids].copy()
    min_margin = np.inf
    for it in range(n_iter + 1):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        if C.shape[0] > 1:
            part = np.partition(d, 1, axis=1)
            gaps = part[:, 1] - part[:, 0]
            nz = gaps[gaps > 0]
            if nz.size:
                min_margin = min(min_margin, nz.min())
        a = d.argmin(axis=1)
        if it == n_iter:
            break
        for j in range(C.shape[0]):
            m = a == j
            if m.any():
                C[j] = X[m].sum(axis=0) / m.sum()
    return a.tolist(), min_margin


def _kcenter_replay(vecs: list[list[int]], k: int):
    """Pure-NumPy replay of operators.diversity.kcenter_select; returns
    (picks as (order, id, sq_dist) list, min nonzero argmax margin)."""
    X = np.array(vecs, dtype=np.float64)
    ids = np.arange(len(vecs))
    seed = int(ids[_seed_order(ids, "kcenter")[0]])
    picks = [(0, seed, 0.0)]
    centers = [X[seed]]
    picked = {seed}
    min_margin = np.inf
    for order in range(1, k):
        if len(picked) == len(vecs):
            break
        C = np.stack(centers)
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).min(axis=1)
        mask = np.array([int(i) not in picked for i in ids])
        dm = np.where(mask, d, -np.inf)
        best = int(np.argmax(dm))  # first index = lowest id on ties
        rest = np.sort(dm[mask])[::-1]
        if rest.size > 1 and rest[0] > rest[1]:
            min_margin = min(min_margin, rest[0] - rest[1])
        picks.append((order, best, float(dm[best])))
        centers.append(X[best])
        picked.add(best)
    return picks, min_margin


@settings(max_examples=60, deadline=None)
@given(
    vecs=st.lists(_vec, min_size=1, max_size=14),
    k=st.integers(min_value=1, max_value=6),
    n_iter=st.integers(min_value=1, max_value=3),
)
def test_kmeans_oracle_matches_replay(vecs, k, n_iter):
    expected, margin = _kmeans_replay(vecs, k, n_iter)
    # discard sub-1e-6 NONZERO margins (association-order ulps could
    # legitimately flip those; exact ties resolve identically)
    assume(margin == np.inf or margin > 1e-6)
    conn = duckdb.connect()
    conn.register("embeddings", _frame(vecs))
    sql = "WITH " + _kmeans_assign_cte(k=k, n_iter=n_iter) + (
        " SELECT vec_id, cluster FROM af ORDER BY vec_id"
    )
    got = conn.execute(sql).df()
    conn.close()
    assert got["vec_id"].tolist() == list(range(len(vecs)))
    # replay clusters index into the SORTED seed-id array == oracle's
    # row_number renumbering in vec_id order
    assert got["cluster"].tolist() == expected


@settings(max_examples=60, deadline=None)
@given(
    vecs=st.lists(_vec, min_size=1, max_size=14),
    k=st.integers(min_value=1, max_value=6),
)
def test_kcenter_oracle_matches_replay(vecs, k):
    expected, margin = _kcenter_replay(vecs, k)
    assume(margin == np.inf or margin > 1e-6)
    conn = duckdb.connect()
    conn.register("embeddings", _frame(vecs))
    got = conn.execute(_kcenter_sql(k=k)).df()
    conn.close()
    assert [
        (int(r.pick_order), int(r.vec_id)) for r in got.itertuples()
    ] == [(o, i) for o, i, _ in expected]
    np.testing.assert_allclose(
        got["sq_dist_at_pick"].to_numpy(),
        np.array([d for _, _, d in expected]),
        rtol=0,
        atol=1e-9,
    )
