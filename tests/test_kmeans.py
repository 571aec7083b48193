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
