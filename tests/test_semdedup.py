"""SemDeDup correctness: the within-cluster prune pinned against a
brute-force Python reference, plus the k-means composition (rows-only
for the driver) checked end to end from the same deterministic seed."""

import numpy as np
import pytest

from pipeline_pyspark_etl_imdb_spark.operators import semdedup
from pipeline_pyspark_etl_imdb_spark.operators.kmeans import lloyd_kmeans
from pipeline_pyspark_etl_imdb_spark.operators.util import release_tracked
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def _reference_prune(vectors: dict, clusters: dict, threshold: float) -> dict:
    """Greedy min-id survivor: id b dropped iff some a < b in the same
    cluster has cosine(a, b) >= threshold."""
    kept = {}
    by_cluster: dict = {}
    for i, c in clusters.items():
        by_cluster.setdefault(c, []).append(i)
    for c, ids in by_cluster.items():
        for b in ids:
            dropped = False
            vb = vectors[b]
            nb = np.linalg.norm(vb)
            for a in ids:
                if a >= b:
                    continue
                va = vectors[a]
                denom = np.linalg.norm(va) * nb
                if denom > 0 and float(va @ vb) / denom >= threshold:
                    dropped = True
                    break
            kept[b] = not dropped
    return kept


def test_flags_match_reference(spark, emb):
    rows = emb.collect()
    vectors = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    # synthetic clusters: 8 deterministic groups by id
    clusters = {i: i % 8 for i in vectors}
    cdf = spark.createDataFrame(
        sorted(clusters.items()), "vec_id bigint, cluster int"
    )
    got = {
        r.vec_id: (r.cluster, r.is_kept)
        for r in semdedup.semdedup_flags(emb, cdf, threshold=0.35).collect()
    }
    release_tracked()
    ref = _reference_prune(vectors, clusters, 0.35)
    assert set(got) == set(ref)
    for i, keep in ref.items():
        assert got[i] == (clusters[i], keep), f"vec {i}"


def test_every_cluster_keeps_at_least_one(spark, emb):
    out = semdedup.semdedup_lsh(emb, threshold=0.35).collect()
    release_tracked()
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r.cluster, []).append(r)
    for c, rows in by_cluster.items():
        assert any(r.is_kept for r in rows), f"cluster {c} fully dropped"
        # the min-id member of every cluster always survives
        assert min(rows, key=lambda r: r.vec_id).is_kept


def test_kmeans_variant_matches_kmeans_then_prune(spark, emb):
    """semdedup_kmeans == lloyd_kmeans assignments + reference prune
    (same seed, same rounds) — the composition adds no nondeterminism."""
    assigned, _ = lloyd_kmeans(emb, k=8, n_iter=2)
    clusters = {r.vec_id: r.cluster for r in assigned.select("vec_id", "cluster").collect()}
    vectors = {
        r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()
    }
    ref = _reference_prune(vectors, clusters, 0.35)
    got = {
        r.vec_id: r.is_kept
        for r in semdedup.semdedup_kmeans(emb, k=8, n_iter=2, threshold=0.35).collect()
    }
    release_tracked()
    assert got == ref


def test_null_embedding_always_kept(spark):
    df = spark.createDataFrame(
        [(1, [1.0] * 4), (2, [1.0] * 4), (3, None)],
        "vec_id bigint, embedding array<float>",
    )
    cdf = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0)], "vec_id bigint, cluster int"
    )
    got = {
        r.vec_id: r.is_kept
        for r in semdedup.semdedup_flags(df, cdf, threshold=0.9).collect()
    }
    release_tracked()
    assert got == {1: True, 2: False, 3: True}
