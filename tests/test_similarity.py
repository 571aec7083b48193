"""ANN quality gates: the approximate paths must actually approximate —
recall against exact brute force above a floor, and the IVF index must be
deterministic across builds. (The LSH path is hash-exact against the SQL
oracle; IVF is rows-only at the driver, so this is its correctness gate.)"""

import pytest

from pipeline_pyspark_etl_imdb_spark.operators import similarity
from tests.conftest import SF_ORACLE

QUERY_IDS = list(range(20))
K = 5


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").cache()


def _neighbor_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_ivf_recall_vs_bruteforce(emb):
    exact = _neighbor_sets(similarity.cosine_knn(emb, k=K, query_ids=QUERY_IDS))
    approx = _neighbor_sets(
        similarity.ann_ivf_knn(emb, k=K, n_centroids=16, n_probe=4, query_ids=QUERY_IDS)
    )
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    recall = hits / (len(exact) * K)
    assert recall >= 0.5, f"IVF recall {recall:.2f} below floor"


def test_ivf_probes_fraction_of_corpus(emb):
    # the point of IVF: search must touch only ~n_probe/n_centroids of data
    _, assignments = similarity.ivf_index(emb, n_centroids=16)
    sizes = [r["count"] for r in assignments.groupBy("centroid_id").count().collect()]
    assert len(sizes) == 16
    assert max(sizes) < emb.count() * 0.5  # no degenerate mega-cluster


def test_ivf_index_deterministic(emb):
    a = sorted(similarity.ivf_index(emb, 16)[1].collect())
    b = sorted(similarity.ivf_index(emb, 16)[1].collect())
    assert a == b
