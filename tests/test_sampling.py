"""Stratified sampling: per-stratum fractions near their targets,
same-seed determinism, and subset-of-source membership (the rows-only
driver check can't see any of this)."""

from pipeline_pyspark_etl_imdb_spark.plans.registry import (
    DOC_SAMPLE_FRACTIONS as FRACTIONS,
)
from pipeline_pyspark_etl_imdb_spark.plans.registry import QUERIES
from tests.conftest import SF_ORACLE


def test_stratified_fractions_and_determinism(spark):
    fn = QUERIES["stratified_doc_sample"]
    a = fn(spark, SF_ORACLE).collect()
    b = fn(spark, SF_ORACLE).collect()
    assert sorted(a) == sorted(b)  # same seed -> same sample

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    totals = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    got = {}
    for r in a:
        got[r.lang] = got.get(r.lang, 0) + 1
    for lang, frac in FRACTIONS.items():
        if lang not in totals:
            continue
        n, expected = got.get(lang, 0), totals[lang] * frac
        # Bernoulli sampling: allow 4 sigma
        sigma = (totals[lang] * frac * (1 - frac)) ** 0.5
        assert abs(n - expected) <= 4 * sigma + 1, (lang, n, expected)

    src_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert {r.doc_id for r in a} <= src_ids
