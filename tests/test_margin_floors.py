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

r8 extension (VERDICT r7 item #1): the same guard for every OTHER
6-decimal-rounded float oracle emission. Hypothesis proved the boundary
class is live (test_graph_oracle_property found a pagerank micro-graph
whose rank straddles a half-boundary at ~1e-16), so each such oracle
now has a fixture-level floor here:

- supplier_pagerank: half-boundary distance of the emitted top-100
  ranks, and the raw-rank top-100 cut margin (kept set stability).
  Measured: half-boundary 3.32e-8 / 6.43e-9 / 7.27e-9, cut 0 (exact
  structural tie, sf0.001 — never hashed) / 3.61e-3 / 4.57e-9.
- rag_chunk_bm25: half-boundary distance of the top-40 scores (covers
  both the hashed top-20 values and order flips across the rounded
  cut). Measured: 4.60e-9 / 1.26e-8 / 1.01e-8.
- media_audio_fingerprints: relative |rms - mean(rms)| threshold margin
  per clip (the only float comparison in the media kernels).
  Measured min: 2.00e-6 / 4.99e-6 / 2.32e-7.
- media_ahash_values: the rule is INTEGER-exact (scaled-integer
  threshold, multimodal.media_ahash docstring), so there is no rounding
  margin to guard — the cross-engine risk is int64 overflow (NumPy
  wraps silently, DuckDB promotes to HUGEINT); the floor is headroom.
  Measured max intermediate: 8.9e9, asserted < 2^40.
- copurchase_communities / copurchase_bfs_hops / copurchase_k_core:
  integer emissions end to end (labels, hops, degrees; LPA's vote
  tie-rule is integer count + min label) — no float comparison exists,
  so no floor is needed or possible. Recorded here so the oracle-floor
  inventory is complete.
"""

import hashlib
import os

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


# --- r8 floors: the remaining 6-decimal-rounded float oracles ---------------

PAGERANK_HALF_FLOOR = 2.0e-9  # measured min 6.43e-9 (sf0.01)
PAGERANK_CUT_FLOOR = 1.0e-9  # measured min 4.57e-9 (sf0.1); sf0.001 is an
#   exact structural tie (see test body) and is never driver-hashed
BM25_HALF_FLOOR = 1.0e-9  # measured min 4.60e-9 (sf0.001)
AUDIO_RMS_REL_FLOOR = 1.0e-7  # measured min 2.32e-7 (sf0.1)
AHASH_HEADROOM_CAP = 2**40  # measured max intermediate 8.9e9; int64
#   wrap (NumPy) vs HUGEINT promotion (DuckDB) diverges at 2^63


def _half_boundary_dist(vals) -> float:
    """Distance of each value from the nearest round(·, 6) HALF-boundary
    (where the rounded output flips under a tiny perturbation)."""
    r = np.asarray(vals, dtype=np.float64) * 1e6
    return float(np.abs((r - np.floor(r)) - 0.5).min()) * 1e-6


def _graph_conn(sf_dir):
    import duckdb

    conn = duckdb.connect()
    for t in ("lineitem", "orders", "documents"):
        conn.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return conn


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_pagerank_rounding_and_cut_margin_floors(sf_dir):
    from pipeline_pyspark_etl_imdb_spark.plans.oracles import _pagerank_sql

    conn = _graph_conn(sf_dir)
    # top=200: the emitted 100 plus the runner-ups that define the cut
    ranks = conn.execute(_pagerank_sql(10, top=200)).df()["rank"].to_numpy()
    conn.close()
    half = _half_boundary_dist(ranks[:100])
    assert half >= PAGERANK_HALF_FLOOR, (
        f"{sf_dir}: an emitted pagerank rank sits {half:.3e} from a "
        f"6-decimal half-boundary (floor {PAGERANK_HALF_FLOOR:.1e}) — "
        "supplier_pagerank's hashed values could flip under cross-engine "
        "float spread on this fixture (the class Hypothesis proved live, "
        "test_graph_oracle_property.py)"
    )
    if len(ranks) <= 100:
        return
    cut = float(ranks[99] - ranks[100])
    if cut == 0.0:
        # exact raw tie at the cut (bit-identical DuckDB sums — observed
        # at sf0.001, which no hash protocol ever covers: the driver and
        # the local gates run sf0.01/sf0.1 only). A tie that is exact in
        # one engine but 1-ulp split in the other WOULD be unstable, so
        # this branch must never appear on a hashed fixture.
        assert sf_dir.endswith("sf0.001"), (
            f"{sf_dir}: exact raw-rank tie AT the top-100 cut on a "
            "driver-hashed fixture — the kept node set is not "
            "engine-stable; re-measure before trusting a hash row"
        )
        return
    assert cut >= PAGERANK_CUT_FLOOR, (
        f"{sf_dir}: pagerank top-100 cut margin {cut:.3e} fell below the "
        f"floor {PAGERANK_CUT_FLOOR:.1e} — the kept node set is no longer "
        "engine-stable on this fixture"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_bm25_cut_rounding_margin_floor(sf_dir):
    from pipeline_pyspark_etl_imdb_spark.plans.oracles import ORACLES

    sql = ORACLES["rag_chunk_bm25"]
    assert "LIMIT 20" in sql  # the widened cut below must actually widen
    conn = _graph_conn(sf_dir)
    # top-40: the hashed top-20 scores plus the band below the rounded
    # cut, where a half-boundary flip could re-order a chunk into the
    # kept set
    scores = (
        conn.execute(sql.replace("LIMIT 20", "LIMIT 40")).df()["score"].to_numpy()
    )
    conn.close()
    half = _half_boundary_dist(scores)
    assert half >= BM25_HALF_FLOOR, (
        f"{sf_dir}: a bm25 score within the top-40 band sits {half:.3e} "
        f"from a 6-decimal half-boundary (floor {BM25_HALF_FLOOR:.1e}) — "
        "rag_chunk_bm25's hashed values or rounded-score cut order could "
        "flip under cross-engine float spread on this fixture"
    )


def _doc_payload_params(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return zip(t["doc_id"].to_pylist(), t["text"].to_pylist())


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_audio_fingerprint_rms_margin_floor(sf_dir):
    """Replays media_real_containers' WAV payload construction + the
    media_audio_fingerprint envelope (the kernels' documented rules) and
    measures the only float comparison in the media family:
    ``rms_block >= mean(rms)``. Relative margin, because the
    cross-engine sum-order spread is relative (~1e-15)."""
    n_blocks = 16
    rel_min = np.inf
    for doc_id, text in _doc_payload_params(sf_dir):
        if text is None or doc_id % 2 == 0:
            continue  # even ids are BMP payloads (integer-exact rule)
        data = text.encode("utf-8")
        n = len(data)
        fill = data if data else b"\x00"
        channels, n_samples = 1 + n % 2, 1 + n % 500
        need = n_samples * channels * 2
        frames = (fill * (need // len(fill) + 1))[:need]
        samples = (
            np.frombuffer(frames, dtype="<i2")
            .astype(np.float64)
            .reshape(-1, channels)
            .mean(axis=1)
        )
        m = len(samples)
        idx = (np.arange(m) * n_blocks) // m
        sums = np.zeros(n_blocks)
        cnts = np.zeros(n_blocks)
        np.add.at(sums, idx, samples * samples)
        np.add.at(cnts, idx, 1.0)
        rms = np.sqrt(sums / np.maximum(cnts, 1.0))
        mean = rms.mean()
        if mean > 0:
            rel_min = min(rel_min, float(np.abs(rms - mean).min() / mean))
    assert rel_min >= AUDIO_RMS_REL_FLOOR, (
        f"{sf_dir}: an audio-envelope block RMS sits {rel_min:.3e} "
        f"(relative) from the clip-mean threshold (floor "
        f"{AUDIO_RMS_REL_FLOOR:.1e}) — media_audio_fingerprints' bit "
        "pattern is no longer engine-stable on this fixture"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_ahash_integer_headroom(sf_dir):
    """media_ahash's threshold rule is scaled-INTEGER (no float margin to
    guard) — the divergence risk is overflow: the NumPy kernel wraps
    int64 silently at 2^63 while the DuckDB oracle promotes to HUGEINT.
    Asserts every intermediate (n_bits * v_b and sum(v)) keeps 22+ bits
    of headroom on the fixture payloads."""
    hash_size = 8
    n_bits = hash_size * hash_size
    head_max = 0
    for doc_id, text in _doc_payload_params(sf_dir):
        if text is None or doc_id % 2 == 1:
            continue
        data = text.encode("utf-8")
        n = len(data)
        fill = data if data else b"\x00"
        w, h = 1 + n % 64, 1 + int(doc_id) % 32
        need = w * h * 3
        pix = (fill * (need // len(fill) + 1))[:need]
        a = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, 3)
        gray3 = a.astype(np.int64).sum(axis=2)
        ys = (np.arange(h) * hash_size) // h
        xs = (np.arange(w) * hash_size) // w
        sums3 = np.zeros((hash_size, hash_size), dtype=np.int64)
        cnts = np.zeros((hash_size, hash_size), dtype=np.int64)
        np.add.at(sums3, (ys[:, None], xs[None, :]), gray3)
        np.add.at(cnts, (ys[:, None], xs[None, :]), 1)
        D = 1
        for c in np.unique(cnts[cnts > 0]):
            D *= int(c)
        v = sums3 * (D // np.maximum(cnts, 1)) * (cnts > 0)
        head_max = max(head_max, int(n_bits * np.abs(v).max()), int(abs(v.sum())))
    assert head_max < AHASH_HEADROOM_CAP, (
        f"{sf_dir}: ahash integer intermediate reached {head_max} "
        f"(cap 2^40={AHASH_HEADROOM_CAP}) — payload growth is eating the "
        "overflow headroom that keeps the NumPy kernel and the HUGEINT "
        "DuckDB oracle equivalent"
    )


# --- r9: floors for the remaining round( classes + the meta-gate ----------
# (VERDICT r8 item #4: the floor inventory was complete BY HAND; the
# meta-gate below keeps it complete when new oracles land. Building it
# immediately found two unfloored sites: event_value_bh_fdr's round(p, 9)
# decisions and embedding_int8_quantize's half-integer ties.)

CENTS_HALF_DIST_FLOOR = 0.4  # measured 0.49999... at every SF (2-decimal
#   doubles scaled x100/x10000 land ~1e-9 from integers, never near .5)
INT8_TIE_FLOOR = 1.0e-6  # measured min 6.10e-6 (sf0.1)
BH_FDR_P_HALF_FLOOR = 1.0e-11  # measured min 9.00e-11 (sf0.1)
BH_FDR_DECISION_GAP_FLOOR = 1.0e-3  # measured min 1.58e-2 (sf0.1)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_cents_scaling_half_boundary_floor(sf_dir):
    """The exact-integer-scaling oracle class (CAST(round(price * 100) AS
    BIGINT) and friends): price columns are DOUBLEs, so 'exact' really
    means every scaled value sits ~1e-9 from an integer and ~0.5 from
    the round() half-boundary. A regenerated fixture with >2-decimal
    prices (>4-decimal event values) would quietly break eleven oracles
    at once — this floor names it."""
    for tbl, col, scale in (
        ("orders", "o_totalprice", 100),
        ("lineitem", "l_extendedprice", 100),
        ("events", "value", 10000),
        ("lineitem", "l_quantity", 1),
    ):
        v = (
            pq.read_table(f"{sf_dir}/{tbl}.parquet", columns=[col])[col]
            .to_numpy(zero_copy_only=False)
        )
        v = v[~np.isnan(v)] * scale
        half_dist = float(np.abs(v - np.floor(v) - 0.5).min())
        assert half_dist >= CENTS_HALF_DIST_FLOOR, (
            f"{sf_dir}: {tbl}.{col} x{scale} sits {half_dist:.3e} from a "
            f"round() half-boundary (floor {CENTS_HALF_DIST_FLOOR}) — the "
            "cents-scaling oracle class is no longer exact on this fixture"
        )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_int8_quantize_tie_margin_floor(sf_dir):
    """embedding_int8_quantize: q = clip(round(x/s)) with per-dimension
    s = max|x|/127. Both engines round ties away from zero, but a value
    within ~1e-13 of k+0.5 could still flip between engines' 1e-15-apart
    x/s computations."""
    _, X = _load(sf_dir)
    s = np.abs(X).max(axis=0) / 127.0
    with np.errstate(divide="ignore", invalid="ignore"):
        r = np.where(s > 0, X / s, 0.0)
    tie_dist = float(np.abs(r - np.floor(r) - 0.5).min())
    assert tie_dist >= INT8_TIE_FLOOR, (
        f"{sf_dir}: x/s sits {tie_dist:.3e} from a half-integer (floor "
        f"{INT8_TIE_FLOOR:.1e}) — the int8 code hash oracle is no longer "
        "engine-stable on this fixture"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_bh_fdr_rounding_margin_floors(sf_dir):
    """event_value_bh_fdr ranks and rejects on round(p, 9). Two guarded
    comparisons: each p's distance from a 1e-9 rounding half-boundary
    (rank stability), and the |round(p,9) - round(crit,9)| gap that
    decides rejection (no exact ties measured; an exact tie would be the
    first thing to investigate, hence asserted zero)."""
    import duckdb

    from pipeline_pyspark_etl_imdb_spark.plans.oracles import ORACLES

    conn = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        conn.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    pdf = conn.execute(
        f"SELECT p_value, bh_critical FROM ({ORACLES['event_value_bh_fdr']})"
    ).df()
    conn.close()
    p = pdf["p_value"].to_numpy()
    crit = pdf["bh_critical"].to_numpy()
    mask = ~np.isnan(p)
    assert mask.any(), f"{sf_dir}: no finite p-values"
    scaled = p[mask] * 1e9
    half = float((np.abs(scaled - np.floor(scaled) - 0.5) * 1e-9).min())
    assert half >= BH_FDR_P_HALF_FLOOR, (
        f"{sf_dir}: a p-value sits {half:.3e} from a 1e-9 rounding "
        f"half-boundary (floor {BH_FDR_P_HALF_FLOOR:.1e})"
    )
    gaps = np.abs(np.round(p[mask], 9) - np.round(crit[mask], 9))
    assert int((gaps == 0).sum()) == 0, (
        f"{sf_dir}: exact round(p,9) == round(crit,9) tie — rejection "
        "depends on engine float equality; re-measure before trusting"
    )
    assert float(gaps.min()) >= BH_FDR_DECISION_GAP_FLOOR, (
        f"{sf_dir}: BH rejection decided by a {gaps.min():.3e} gap "
        f"(floor {BH_FDR_DECISION_GAP_FLOOR:.1e})"
    )


# --- meta-gate: every round( site in oracles.py must be classified --------

_ORACLES_PATH = os.path.join(
    os.path.dirname(__file__),
    "..",
    "pipeline_pyspark_etl_imdb_spark",
    "plans",
    "oracles.py",
)

# owner -> the floor test (or note) that covers its rounding sites
_FLOORED = {
    "rag_chunk_bm25": "test_bm25_cut_rounding_margin_floor",
    "media_ahash_values": "test_ahash_integer_headroom",
    "event_value_bh_fdr": "test_bh_fdr_rounding_margin_floors",
    "embedding_int8_quantize": "test_int8_quantize_tie_margin_floor",
}
# owners whose round( sites are the exact-integer-scaling class, guarded
# jointly by test_cents_scaling_half_boundary_floor
_EXACT_SCALING = {
    "lineitem_exact_median",
    "status_exact_median",
    "lineitem_weighted_median",
    "event_value_mad_anomalies",
    "status_price_mad_anomalies",
    "status_price_iqr",
    "lineitem_trimmed_mean",
    "priority_price_bands",
    "status_price_ks_test",
    "order_price_bootstrap_ci",
    "benford_price_digits",
}


def _round_sites(src: str) -> dict[str, int]:
    """owner (oracle name / helper def) -> count of round( occurrences.

    Owners come from the smallest enclosing AST span: a dict entry of the
    ORACLES literal, an ORACLES["x"] = ... assignment, or a helper def.
    Pure Python comment lines are skipped (SQL -- comments inside oracle
    strings still count toward their owner — harmless and simpler)."""
    import ast as _ast
    import re as _re

    tree = _ast.parse(src)
    spans: list[tuple[str, int, int]] = []

    def _add(owner, node):
        spans.append((owner, node.lineno, node.end_lineno))

    for node in tree.body:
        if isinstance(node, (_ast.FunctionDef, _ast.AsyncFunctionDef)):
            _add(node.name, node)
        elif isinstance(node, (_ast.Assign, _ast.AnnAssign)):
            targets = (
                node.targets if isinstance(node, _ast.Assign) else [node.target]
            )
            val = node.value
            if val is None:
                continue
            for t in targets:
                if (
                    isinstance(t, _ast.Subscript)
                    and isinstance(t.value, _ast.Name)
                    and t.value.id == "ORACLES"
                    and isinstance(t.slice, _ast.Constant)
                ):
                    _add(t.slice.value, node)
                elif isinstance(t, _ast.Name):
                    if t.id == "ORACLES" and isinstance(val, _ast.Dict):
                        for k, v in zip(val.keys, val.values):
                            if isinstance(k, _ast.Constant):
                                _add(k.value, v)
                    else:
                        _add(t.id, node)

    out: dict[str, int] = {}
    for i, line in enumerate(src.splitlines(), 1):
        if line.lstrip().startswith("#"):
            continue
        n = len(_re.findall(r"\bround\s*\(", line, _re.I))
        if not n:
            continue
        cands = [(o, a, b) for o, a, b in spans if a <= i <= b]
        owner = min(cands, key=lambda c: c[2] - c[1])[0] if cands else "<module>"
        out[owner] = out.get(owner, 0) + n
    return out


def test_every_oracle_round_site_is_floor_classified():
    """A new round( emission in plans/oracles.py without a registered
    margin floor (or an exact-scaling classification) fails HERE by
    name, instead of surfacing later as an opaque driver hash red."""
    with open(_ORACLES_PATH) as fh:
        sites = _round_sites(fh.read())
    known = set(_FLOORED) | _EXACT_SCALING
    unclassified = {o: n for o, n in sites.items() if o not in known}
    assert not unclassified, (
        f"round( emission(s) in plans/oracles.py without a margin floor: "
        f"{unclassified} — add a fixture-level floor test here and "
        "register the owner in _FLOORED or _EXACT_SCALING"
    )
    stale = known - set(sites)
    assert not stale, (
        f"floor registrations without any round( site left: {stale} — "
        "remove the dead entry so the inventory stays exact"
    )


def test_round_site_scanner_detects_a_planted_oracle():
    """The gate is only as good as its scanner: a synthetic un-floored
    oracle appended to the module source must surface as unclassified."""
    with open(_ORACLES_PATH) as fh:
        src = fh.read()
    planted = (
        src + '\nORACLES["zz_planted_unfloored"] = '
        '"SELECT round(score, 6) AS s FROM t"\n'
    )
    sites = _round_sites(planted)
    assert sites.get("zz_planted_unfloored") == 1
    assert "zz_planted_unfloored" not in (set(_FLOORED) | _EXACT_SCALING)
