"""Prototypicality scoring gates: the distributed centroid-cosine must
match an independent NumPy computation, the rank must order least-
prototypical first, and the plan must broadcast the k-row centroid frame
(no corpus-sized shuffle on the scoring side)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.prototypes import (
    centroid_cosine_scores,
    label_centroids,
)

SF_SMOKE = "/root/testdata/sf0.001"
DIM = 64


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


@pytest.fixture(scope="module")
def scored(spark, emb):
    return centroid_cosine_scores(emb, dim=DIM)


def test_matches_numpy(emb, scored):
    rows = emb.select("vec_id", "label", "embedding").collect()
    X = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    lab = {r.vec_id: r.label for r in rows}
    cents = {}
    for lb in set(lab.values()):
        members = np.stack([X[i] for i in X if lab[i] == lb])
        cents[lb] = members.mean(axis=0)
    got = {r.vec_id: r.cos_centroid for r in scored.collect()}
    assert set(got) == set(X)
    for vid, v in X.items():
        c = cents[lab[vid]]
        want = float(v @ c / (np.linalg.norm(v) * np.linalg.norm(c)))
        assert got[vid] == pytest.approx(want, abs=1e-9)


def test_rank_orders_least_prototypical_first(scored):
    pdf = scored.toPandas()
    for _, grp in pdf.groupby("label"):
        grp = grp.sort_values("outlier_rank")
        assert list(grp.outlier_rank) == list(range(1, len(grp) + 1))
        assert grp.cos_centroid.is_monotonic_increasing


def test_every_vector_scored_within_unit_interval(scored):
    bad = scored.where(
        (F.col("cos_centroid") > 1.0 + 1e-12) | (F.col("cos_centroid") < -1.0 - 1e-12)
    ).count()
    assert bad == 0


def test_centroid_frame_is_k_rows(emb):
    cents = label_centroids(emb, dim=DIM)
    k = emb.select("label").distinct().count()
    assert cents.count() == k


def test_plan_broadcasts_centroids(scored):
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the centroid battery is ONE partial-aggregated groupBy; the scoring
    # side adds no extra Exchange beyond the window's label partition
    assert "HashAggregate" in plan


def test_confusion_matrix_matches_numpy(emb):
    import numpy as np
    from pipeline_pyspark_etl_imdb_spark.operators.prototypes import (
        label_confusion_matrix,
    )

    rows = emb.select("label", "embedding").collect()
    by_label: dict = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(np.array(r.embedding, np.float64))
    cents = {lb: np.stack(v).mean(axis=0) for lb, v in by_label.items()}
    got = {
        (r.label_a, r.label_b): r.cos_centroids
        for r in label_confusion_matrix(emb, dim=DIM).collect()
    }
    labels = sorted(cents)
    assert len(got) == len(labels) * (len(labels) - 1) // 2
    for i, a in enumerate(labels):
        for b in labels[i + 1 :]:
            want = float(
                cents[a] @ cents[b]
                / (np.linalg.norm(cents[a]) * np.linalg.norm(cents[b]))
            )
            assert got[(a, b)] == pytest.approx(want, abs=1e-9)
