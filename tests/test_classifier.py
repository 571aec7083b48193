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
