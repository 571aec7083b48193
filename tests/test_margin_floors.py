"""Float-comparison margin floors for the r6 hash-oracle conversions.

``embedding_kmeans`` / ``semdedup_kmeans`` / ``kcenter_diversity_picks``
carry exact hash oracles ONLY because every float comparison the
algorithms make — the Lloyd argmin, the ``cos >= 0.35`` prune, the
farthest-point argmax, and the 6-decimal rounding of the emitted
``sq_dist_at_pick`` — was MEASURED to clear a margin 5+ orders above the
~1e-13 cross-engine sum-order spread (registry.py ROWS_ONLY comments,
oracles._kmeans_assign_cte / _kcenter_sql docstrings). Those
measurements were one-shot on the current fixtures: regenerating a
fixture or adding a scale factor silently invalidates them, and a
near-threshold comparison would then surface as an opaque hash red in
the driver record (ADVICE r6). These tests recompute the minimum margin
on EVERY fixture with an independent NumPy replay, so a fixture change
trips a named assertion here instead.

Measured minima at the time of writing (sf0.001 / sf0.01 / sf0.1):
- Lloyd argmin relative gap (d2-d1)/d2, min over points x rounds,
  k=16, worst of n_iter=3 and n_iter=4: 8.53e-5 / 1.54e-5 / 1.70e-6
- |cos - 0.35| over same-cluster pairs (n_iter=3 clusters):
  2.32e-4 / 6.94e-4 / 7.80e-6
- k-center per-round argmax gap (chosen d minus runner-up d), k=8:
  1.18e-3 / 1.22e-2 / 1.92e-3
- distance of each emitted sq_dist_at_pick from the nearest 6-decimal
  rounding HALF-boundary (where round() output flips):
  3.36e-8 / 5.91e-8 / 1.52e-7

Floors are set just below the measured minima — any fixture drift that
eats an order of magnitude of margin fails here by name, long before
the ~1e-13 engine spread could flip a comparison.
"""

import hashlib

import numpy as np
import pyarrow.parquet as pq
import pytest

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

ARGMIN_REL_FLOOR = 8.5e-7  # registry.py ROWS_ONLY note / kmeans.py docstring
COS_FLOOR = 5.0e-6  # measured min 7.80e-6 at sf0.1
ARGMAX_FLOOR = 1.0e-3  # measured min 1.18e-3 at sf0.001
HALF_BOUNDARY_FLOOR = 1.0e-8  # measured min 3.36e-8 at sf0.001


def _load(sf_dir):
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = np.asarray(t["vec_id"].to_pylist())
    X = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], X[order]


def _seed(ids, X, k, tag):
    # mirrors kmeans.seed_centroids / diversity's seed: md5(id || ':tag')
    # ascending, id tiebreak, renumbered 0..k-1 in id order
    h = [hashlib.md5(f"{i}:{tag}".encode()).hexdigest() for i in ids]
    picked = sorted(range(len(ids)), key=lambda p: (h[p], ids[p]))[:k]
    return X[np.array(sorted(picked, key=lambda p: ids[p]))]


def _lloyd_margins(X, C0, n_iter):
    """(min relative argmin gap over points x rounds incl. the final
    assignment pass, final assignment vector)."""
    C = C0.copy()
    rel_min = np.inf
    assign = None
    for rnd in range(n_iter + 1):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        part = np.sort(d, axis=1)
        gap = part[:, 1] - part[:, 0]
        rel_min = min(rel_min, float((gap / np.maximum(part[:, 1], 1e-300)).min()))
        assign = d.argmin(axis=1)
        if rnd == n_iter:
            break
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return rel_min, assign


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_kmeans_argmin_margin_floor(sf_dir):
    ids, X = _load(sf_dir)
    C0 = _seed(ids, X, 16, "kmeans")
    worst = min(
        _lloyd_margins(X, C0, n_iter)[0]
        for n_iter in (3, 4)  # semdedup_kmeans / embedding_kmeans configs
    )
    assert worst >= ARGMIN_REL_FLOOR, (
        f"{sf_dir}: Lloyd argmin relative margin {worst:.3e} fell below the "
        f"documented floor {ARGMIN_REL_FLOOR:.1e} — the embedding_kmeans / "
        "semdedup_kmeans hash oracles are no longer engine-stable on this "
        "fixture; re-measure before trusting a driver hash row"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_semdedup_cosine_prune_margin_floor(sf_dir):
    ids, X = _load(sf_dir)
    _, assign = _lloyd_margins(X, _seed(ids, X, 16, "kmeans"), n_iter=3)
    norms = np.linalg.norm(X, axis=1)
    worst = np.inf
    for c in np.unique(assign):
        idx = np.where(assign == c)[0]
        if len(idx) < 2:
            continue
        V, N = X[idx], norms[idx]
        cos = (V @ V.T) / np.outer(N, N)
        vals = cos[np.triu_indices(len(idx), 1)]
        vals = vals[np.isfinite(vals)]  # zero-norm pairs never compare
        if len(vals):
            worst = min(worst, float(np.abs(vals - 0.35).min()))
    assert worst >= COS_FLOOR, (
        f"{sf_dir}: |cos - 0.35| prune margin {worst:.3e} fell below the "
        f"documented floor {COS_FLOOR:.1e} — the semdedup_kmeans hash oracle "
        "is no longer engine-stable on this fixture"
    )


def _kcenter_margins(ids, X, k=8):
    h = [hashlib.md5(f"{i}:kcenter".encode()).hexdigest() for i in ids]
    seed_pos = min(range(len(ids)), key=lambda p: (h[p], ids[p]))
    centers, chosen = [X[seed_pos]], {seed_pos}
    argmax_gap, picked_d = np.inf, []
    for _ in range(1, min(k, len(ids))):
        d = (
            ((X[:, None, :] - np.stack(centers)[None, :, :]) ** 2)
            .sum(axis=2)
            .min(axis=1)
        )
        cand = sorted(
            (p for p in range(len(ids)) if p not in chosen),
            key=lambda p: (-d[p], ids[p]),
        )
        best = cand[0]
        if len(cand) > 1:
            argmax_gap = min(argmax_gap, float(d[best] - d[cand[1]]))
        picked_d.append(d[best])
        centers.append(X[best])
        chosen.add(best)
    # distance of each emitted sq_dist_at_pick (rounded to 6 decimals by
    # the hash protocol) from the nearest HALF-boundary, where round()
    # output would flip under a tiny cross-engine float difference
    r = np.asarray(picked_d) * 1e6
    half = float(np.abs((r - np.floor(r)) - 0.5).min()) * 1e-6
    return argmax_gap, half


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_kcenter_argmax_and_rounding_margin_floors(sf_dir):
    ids, X = _load(sf_dir)
    argmax_gap, half = _kcenter_margins(ids, X, k=8)
    assert argmax_gap >= ARGMAX_FLOOR, (
        f"{sf_dir}: k-center argmax gap {argmax_gap:.3e} fell below the "
        f"documented floor {ARGMAX_FLOOR:.1e} — kcenter_diversity_picks' "
        "pick sequence is no longer engine-stable on this fixture"
    )
    assert half >= HALF_BOUNDARY_FLOOR, (
        f"{sf_dir}: an emitted sq_dist_at_pick sits {half:.3e} from a "
        "6-decimal rounding half-boundary (floor "
        f"{HALF_BOUNDARY_FLOOR:.1e}) — its hashed value could flip under "
        "cross-engine float spread on this fixture"
    )
