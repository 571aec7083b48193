"""Lloyd's k-means gates: the distributed loop must reproduce an
independent NumPy Lloyd's run from the same deterministic init —
assignments exactly, centroids to float tolerance — and keep every
cluster non-empty on the fixture."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.kmeans import (
    lloyd_kmeans,
    stride_init_centroids,
)

SF_SMOKE = "/root/testdata/sf0.001"
K, N_ITER = 8, 4


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


@pytest.fixture(scope="module")
def result(spark, emb):
    assigned, cents = lloyd_kmeans(emb, k=K, n_iter=N_ITER)
    a = {r.vec_id: r.cluster for r in assigned.collect()}
    c = {r.cluster: np.array(r.centroid) for r in cents.collect()}
    return a, c


def _numpy_lloyd(X, ids, init, n_iter):
    cents = init.copy()
    for _ in range(n_iter):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # ties -> lowest index, same as engine
        for j in range(len(cents)):
            members = X[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1), cents


def test_kmeans_matches_numpy_from_same_init(spark, emb, result):
    got_assign, got_cents = result
    rows = sorted(
        (r.vec_id, np.array(r.embedding, dtype=np.float64))
        for r in emb.collect()
    )
    ids = [r[0] for r in rows]
    X = np.stack([r[1] for r in rows])
    init_rows = stride_init_centroids(emb, K).collect()
    init = np.stack(
        [np.array(r.centroid) for r in sorted(init_rows, key=lambda r: r.cluster)]
    )
    want_assign, want_cents = _numpy_lloyd(X, ids, init, N_ITER)
    mismatches = sum(
        1 for i, vid in enumerate(ids) if got_assign[vid] != want_assign[i]
    )
    assert mismatches == 0
    for j in range(K):
        np.testing.assert_allclose(got_cents[j], want_cents[j], atol=1e-9)


def test_kmeans_covers_all_clusters(result):
    got_assign, _ = result
    assert len(set(got_assign.values())) == K


def test_seed_centroids_exact_count_any_k(spark, emb):
    """The md5-ordered top-k pick must yield EXACTLY min(n, k) seeds for
    every k — the property the old mod-stride filter violated (its
    survivor count was a Binomial draw around k)."""
    from pipeline_pyspark_etl_imdb_spark.operators.kmeans import seed_centroids

    n = emb.count()
    for k in (1, 3, K, 50, n + 10):
        rows = seed_centroids(emb, k).collect()
        assert len(rows) == min(n, k), f"k={k}"
        assert sorted(r.cluster for r in rows) == list(range(min(n, k)))


def test_assignment_plan_is_map_only(spark, emb):
    """The per-round assignment must be an Arrow-vectorized MAP-ONLY
    stage: no join, no window, and no shuffle beyond the one fan_out
    repartition of the under-parallelized fixture scan."""
    assigned, _ = lloyd_kmeans(emb, k=4, n_iter=1)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("Exchange") <= 1  # fan_out only


def test_centroid_update_plan_no_explode_single_exchange(spark, emb):
    """The update aggregation must be ONE partial-aggregated shuffle of k
    rows — no Generate (posexplode) node, exactly one Exchange, with a
    map-side partial HashAggregate below it."""
    from pyspark.sql import functions as F

    from pipeline_pyspark_etl_imdb_spark.operators.kmeans import centroid_update

    assigned = emb.select(
        (F.col("vec_id") % 4).alias("cluster"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    plan = (
        centroid_update(assigned, 64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Generate" not in plan  # no posexplode of (cluster, dim)
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") == 2  # partial + final
