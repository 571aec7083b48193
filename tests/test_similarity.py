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
    # the point of IVF: search must touch only ~n_probe/n_centroids of data;
    # the hash-stride pick yields a binomial count around the target
    _, assignments = similarity.ivf_index(emb, n_centroids=16)
    sizes = [r["count"] for r in assignments.groupBy("centroid_id").count().collect()]
    assert 8 <= len(sizes) <= 32
    assert max(sizes) < emb.count() * 0.5  # no degenerate mega-cluster


def test_ivf_index_deterministic(emb):
    a = sorted(similarity.ivf_index(emb, 16)[1].collect())
    b = sorted(similarity.ivf_index(emb, 16)[1].collect())
    assert a == b


def test_ivf_plan_has_no_single_partition_exchange(emb):
    # the centroid pick must stay a map-side filter: a global-window or
    # global-sort pick funnels every id through ONE task — the exact shape
    # this test pins out of the plan forever
    plan = (
        similarity.ann_ivf_knn(emb, k=K, query_ids=QUERY_IDS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange SinglePartition" not in plan


def test_scaled_params_track_corpus_size():
    # fixture scales keep today's oracle-checked values...
    assert similarity.scaled_n_planes(500) == 4
    assert similarity.scaled_n_centroids(500) == 16
    # ...while real scales grow: occupancy n/2^p and scan share p*n/c both
    # stay bounded instead of blowing up quadratically/linearly
    assert similarity.scaled_n_planes(10**9) == 23
    assert 2 ** similarity.scaled_n_planes(10**9) >= 10**9 // 256
    assert similarity.scaled_n_centroids(10**9) == 22361
    # monotone, clamped
    assert similarity.scaled_n_planes(0) == 4
    assert similarity.scaled_n_planes(10**12, cap=32) == 32
    assert similarity.scaled_n_centroids(1) == 16


def test_pq_recall_vs_bruteforce(emb):
    # PQ + ADC shortlist + exact re-rank. The fixture is ~uniform on the
    # 64-d unit sphere — the hardest regime for quantization (no cluster
    # structure for the codebook to exploit), so the floor sits below the
    # IVF gate; note PQ reaches it scanning only the m-byte codes plus an
    # 8% re-rank fetch, vs IVF's 25% raw-vector probe.
    exact = _neighbor_sets(similarity.cosine_knn(emb, k=K, query_ids=QUERY_IDS))
    approx = _neighbor_sets(
        similarity.ann_pq_knn(emb, k=K, query_ids=QUERY_IDS)
    )
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    recall = hits / (len(exact) * K)
    assert recall >= 0.45, f"PQ recall {recall:.2f} below floor"


def test_pq_codes_deterministic_and_complete(emb):
    # decimal distances make the argmin engine-exact -> identical codes
    # across builds; every vector must get exactly m codes
    cw_a, codes_a = similarity.pq_index(emb)
    cw_b, codes_b = similarity.pq_index(emb)
    a = sorted(codes_a.collect())
    assert a == sorted(codes_b.collect())
    n = emb.count()
    assert codes_a.count() == n * 16
    assert codes_a.select("vec_id").distinct().count() == n


def test_pq_plan_has_no_single_partition_exchange(emb):
    # same gate as IVF: the anchor pick must stay a map-side filter
    plan = (
        similarity.ann_pq_knn(emb, k=K, query_ids=QUERY_IDS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange SinglePartition" not in plan
