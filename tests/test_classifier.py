"""The learned document filter must actually separate: trained on one
half of a synthetic two-class corpus, it must rank held-out positives
above held-out negatives (AUC), and scoring must be map-only."""

from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.classifier import (
    score_documents,
    train_doc_classifier,
)

GOOD = "the analysis of the data is clear and the results are consistent"
BAD = "zzz qqq xxx buy now click here zzz qqq xxx free free free"


def _corpus(spark, n=120):
    rows = []
    for i in range(n):
        good = i % 2 == 0
        base = GOOD if good else BAD
        rows.append((i, f"{base} variant {i}", 1 if good else 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_classifier_separates_held_out(spark):
    corpus = _corpus(spark)
    train = corpus.where(F.col("doc_id") % 4 < 2)
    test = corpus.where(F.col("doc_id") % 4 >= 2)
    model = train_doc_classifier(train, "label")
    scored = score_documents(model, test).join(
        test.select("doc_id", "label"), "doc_id"
    )
    rows = scored.collect()
    pos = sorted(r.p_positive for r in rows if r.label == 1)
    neg = sorted(r.p_positive for r in rows if r.label == 0)
    assert pos and neg
    # perfect separation on this synthetic corpus: every held-out positive
    # outscores every held-out negative
    assert min(pos) > max(neg)
    assert all(r.predicted == r.label for r in rows)


def test_scoring_is_map_only(spark):
    corpus = _corpus(spark)
    model = train_doc_classifier(corpus, "label")
    plan = (
        score_documents(model, corpus)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # no shuffle: scoring fuses into the scan


# --- r9: bit-exact coefficient pins (VERDICT r8 item #6) -------------------
# doc_classifier_scores is rows-only because iterative float optimization
# is ENGINE-specific (no DuckDB oracle can exist) — but on THIS engine the
# L-BFGS fit is bit-reproducible: same fixture, same partitioning, same
# JVM build => identical gradient fold order => identical coefficients
# (verified across fresh processes, 2x per fixture). Pinning the md5 of
# the raw coefficient doubles upgrades the query's local gate from
# 98.9%-score-agreement to exact model identity: any silent change to
# tokenization, hashing, seed selection, label expression, or the MLlib
# fit surfaces here by name. A Spark-version bump legitimately re-pins
# (the hash is an engine-reproducibility pin, not a cross-engine oracle).

import hashlib
import struct

import pytest

_COEF_PINS = {
    "/root/testdata/sf0.001": "d75bc496640113edce2a404e7faf2439",
    "/root/testdata/sf0.01": "4d54ec1d9a9447781ea9e362388d5e7d",
}
_COEF_PIN_SF01 = ("/root/testdata/sf0.1", "80d86060d0002c1c7053b4e3c41a1f09")


def _registry_model_hash(spark, sf_dir):
    # mirrors registry._doc_classifier_scores' training call exactly
    from pipeline_pyspark_etl_imdb_spark.operators.text import quality_expr

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seed = docs.where(F.col("doc_id") < 500)
    model = train_doc_classifier(
        seed, quality_expr(F.col("text")) >= 0.5, max_iter=10
    )
    co = list(model.coefficients.toArray()) + [model.intercept]
    return hashlib.md5(struct.pack(f"<{len(co)}d", *co)).hexdigest()


@pytest.mark.parametrize("sf_dir", sorted(_COEF_PINS))
def test_doc_classifier_coefficients_are_pinned(spark, sf_dir):
    assert _registry_model_hash(spark, sf_dir) == _COEF_PINS[sf_dir], (
        f"{sf_dir}: trained coefficients changed — either the model path "
        "(tokenize/hash/seed/label/fit) changed semantically, or the "
        "engine build changed; re-verify scores then re-pin"
    )


@pytest.mark.sf01
def test_doc_classifier_coefficients_are_pinned_sf01(spark):
    sf_dir, want = _COEF_PIN_SF01
    assert _registry_model_hash(spark, sf_dir) == want


def test_scoring_survives_session_observations(spark):
    """Regression (r9): the first Dataset.observe() in a session
    initializes SparkSession's lazy, non-serializable ObservationManager;
    a model whose training summary still holds the session then fails
    closure serialization inside model.transform. train_doc_classifier
    strips the summary (save/load roundtrip), so scoring must work in a
    session where observations have already run — the shared-JVM bench /
    driver-window condition."""
    from pyspark.sql import Observation

    obs = Observation()
    spark.range(10).observe(obs, F.count_if(F.col("id") > 3).alias("c")).count()
    assert obs.get["c"] == 6  # observationManager is now initialized

    corpus = _corpus(spark)
    model = train_doc_classifier(corpus, "label")
    rows = score_documents(model, corpus).collect()
    assert len(rows) == 120
