"""FFD packing pinned against a pure-Python first-fit-decreasing
reference plus structural invariants; Zipf fit pinned against NumPy."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.corpus import pack_best_fit
from pipeline_pyspark_etl_imdb_spark.operators.text import vocab_zipf_fit
from tests.conftest import SF_ORACLE


def _py_ffd(items, budget):
    """items: [(id, n_tokens)] -> {id: seq}; longest first, id tie-break."""
    caps, out = [], {}
    for i, t in sorted(items, key=lambda r: (-r[1], r[0])):
        placed = next((j for j, c in enumerate(caps) if c >= t), None)
        if placed is None:
            caps.append(max(budget - t, 0))
            placed = len(caps) - 1
        else:
            caps[placed] -= t
        out[i] = placed
    return out


def test_ffd_matches_python_reference(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    got = pack_best_fit(docs, budget_tokens=128, n_shards=4).collect()
    by_shard: dict = {}
    for r in got:
        by_shard.setdefault(r.shard, []).append((r.doc_id, r.n_tokens, r.seq_idx))
    assert set(by_shard) == {0, 1, 2, 3}
    for shard, rows in by_shard.items():
        want = _py_ffd([(i, t) for i, t, _ in rows], 128)
        assert {i: s for i, t, s in rows} == want, shard


def test_ffd_invariants(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    out = pack_best_fit(docs, budget_tokens=256).collect()
    # every doc appears exactly once
    assert len({r.doc_id for r in out}) == len(out)
    # no sequence over budget unless it holds a single oversized doc
    totals: dict = {}
    counts: dict = {}
    for r in out:
        key = (r.shard, r.seq_idx)
        totals[key] = totals.get(key, 0) + r.n_tokens
        counts[key] = counts.get(key, 0) + 1
    for key, tot in totals.items():
        assert tot <= 256 or counts[key] == 1, key


def test_ffd_sequence_count_bounds(spark):
    """Per shard: one-doc-per-sequence is the upper bound, and capped
    token volume gives the lower bound (each sequence carries at most
    ``budget`` of min(t, budget) mass — an oversized doc contributes
    exactly budget to its dedicated sequence)."""
    budget = 512
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    out = pack_best_fit(docs, budget_tokens=budget).collect()
    assert len(out) > 0
    for shard in {r.shard for r in out}:
        rows = [r for r in out if r.shard == shard]
        n_seqs = len({r.seq_idx for r in rows})
        capped = sum(min(r.n_tokens, budget) for r in rows)
        assert n_seqs <= len(rows)
        assert n_seqs >= -(-capped // budget)  # ceil division


def test_zipf_fit_matches_numpy(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    got = vocab_zipf_fit(docs).collect()[0]
    pdf = (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("t"))
        .where("t <> ''")
        .groupBy("t")
        .count()
        .toPandas()
    )
    pdf = pdf.sort_values(["count", "t"], ascending=[False, True]).reset_index(
        drop=True
    )
    x = np.log(np.arange(1, len(pdf) + 1, dtype=float))
    y = np.log(pdf["count"].to_numpy(dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    assert got.n_types == len(pdf)
    assert got.n_tokens == int(pdf["count"].sum())
    assert got.slope == pytest.approx(slope, rel=1e-9)
    assert got.intercept == pytest.approx(intercept, rel=1e-9)
    r = np.corrcoef(x, y)[0, 1]
    assert got.r2 == pytest.approx(r * r, rel=1e-9)
    assert got.slope < 0  # frequency decreases with rank
