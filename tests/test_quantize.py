"""int8 quantization pinned against hand-computed codes; Matryoshka
recall sanity (identity truncation => recall 1); curriculum stage
monotonicity and balance."""

import pytest
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.corpus import curriculum_stages
from pipeline_pyspark_etl_imdb_spark.operators.quantize import (
    int8_quantize,
    matryoshka_recall,
)
from tests.conftest import SF_ORACLE


def test_int8_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.5]), (2, [-0.5, -2.0, 0.25])],
        "vec_id bigint, embedding array<float>",
    )
    got = {r.vec_id: r for r in int8_quantize(df, dim=3).collect()}
    # scales: 1/127, 2/127, 0.5/127
    assert got[1].qvec == [127, 0, 127]
    assert got[2].qvec == [-64, -127, 64]  # -0.5/(1/127) = -63.5 -> -64 away from zero
    assert got[1].mse == pytest.approx(0.0, abs=1e-12)


def test_int8_zero_dimension_guard(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 3.0]), (2, [0.0, -1.0])],
        "vec_id bigint, embedding array<float>",
    )
    got = {r.vec_id: r.qvec for r in int8_quantize(df, dim=2).collect()}
    assert got[1][0] == 0 and got[2][0] == 0


def test_int8_reconstruction_error_bounded(spark):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    out = int8_quantize(emb)
    # quantization step is s_i <= max|x|/127; squared error per dim is
    # <= (s_i/2)^2 — embeddings are unit-ish, so mse stays tiny
    assert out.where(F.col("mse") > 1e-4).count() == 0
    assert out.count() == emb.count()


def test_matryoshka_identity_truncation_is_perfect(spark):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    out = matryoshka_recall(emb, trunc_dim=64, k=5, query_ids=[0, 1, 2]).collect()
    assert {r.query_id for r in out} == {0, 1, 2}
    assert all(r.recall == 1.0 for r in out)


def test_matryoshka_truncation_recall_in_range(spark):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    out = matryoshka_recall(emb, trunc_dim=8, k=5, query_ids=[0, 1, 2, 3]).collect()
    assert len(out) == 4
    assert all(0.0 <= r.recall <= 1.0 for r in out)
    assert all(r.n_overlap == int(r.recall * 5) for r in out)


def test_curriculum_stages_balanced_and_monotone(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    out = curriculum_stages(docs, n_stages=4).collect()
    n = len(out)
    sizes: dict = {}
    for r in out:
        sizes[r.stage] = sizes.get(r.stage, 0) + 1
    assert set(sizes) == {1, 2, 3, 4}
    assert max(sizes.values()) - min(sizes.values()) <= 1  # ntile balance
    # stage boundaries are monotone in quality
    for s in (1, 2, 3):
        hi = max(r.quality for r in out if r.stage == s)
        lo = min(r.quality for r in out if r.stage == s + 1)
        assert hi <= lo


def test_jl_projection_map_only_and_distortion(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.quantize import jl_project, jl_signs

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    proj = jl_project(emb, in_dim=64, out_dim=16)
    # map-only: the projection must fuse into the scan — no Exchange
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # signs are plan-time constants: stable across calls, balanced-ish
    s1, s2 = jl_signs(64, 16), jl_signs(64, 16)
    assert s1 == s2
    flat = [x for row in s1 for x in row]
    assert 0.35 < flat.count(1.0) / len(flat) < 0.65

    rows = {r.vec_id: r for r in proj.limit(200).collect()}
    import numpy as np

    base = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in emb.where(emb.vec_id.isin(list(rows))).collect()
    }
    S = np.array(s1)
    ids = sorted(rows)[:20]
    # projection equals the literal matrix product (independent recompute)
    for i in ids[:5]:
        want = (S @ base[i]) / 4.0  # 1/sqrt(16)
        assert np.allclose(np.array(rows[i].projection), want, atol=1e-9)
    # JL distortion sanity on sampled pairs: squared distances preserved
    # within a loose band at out_dim=16 (eps ~ sqrt(8 ln n / d))
    for a, b in zip(ids, ids[1:]):
        d_full = float(((base[a] - base[b]) ** 2).sum())
        pa, pb = np.array(rows[a].projection), np.array(rows[b].projection)
        d_proj = float(((pa - pb) ** 2).sum())
        if d_full > 1e-9:
            assert 0.2 < d_proj / d_full < 5.0
