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


def test_neyman_allocation_follows_variance(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.corpus import (
        neyman_stratified_sample,
    )

    # same size strata: 'wild' has huge spread, 'calm' tiny, 'flat' zero
    rows = (
        [("wild", i, float(1000 * (i % 10))) for i in range(100)]
        + [("calm", 1000 + i, 50.0 + (i % 2)) for i in range(100)]
        + [("flat", 2000 + i, 7.0) for i in range(100)]
    )
    df = spark.createDataFrame(rows, "s string, id long, v double")
    out = neyman_stratified_sample(df, "s", "v", total_n=60, id_col="id")
    by = {
        r.s: r.n
        for r in out.groupBy(out.stratum.alias("s")).count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    # zero-variance stratum draws nothing; the volatile one dominates
    assert "flat" not in by
    assert by["wild"] > 50 and by.get("calm", 0) < 5
    # deterministic: same call -> same sampled ids
    ids1 = {r.sample_id for r in out.collect()}
    ids2 = {
        r.sample_id
        for r in neyman_stratified_sample(df, "s", "v", total_n=60, id_col="id").collect()
    }
    assert ids1 == ids2


def test_neyman_zero_variance_everywhere_falls_back_proportional(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.corpus import (
        neyman_stratified_sample,
    )

    # every stratum constant: without the wsum guard 0/0 -> NULL and
    # least() skips it, returning ALL rows and ignoring total_n
    rows = [("a", i, 5.0) for i in range(100)] + [("b", 200 + i, 9.0) for i in range(300)]
    df = spark.createDataFrame(rows, "s string, id long, v double")
    out = neyman_stratified_sample(df, "s", "v", total_n=40, id_col="id")
    by = {r.s: r.n for r in out.groupBy(out.stratum.alias("s")).count()
          .withColumnRenamed("count", "n").collect()}
    assert sum(by.values()) <= 40
    assert by["b"] > by["a"]  # proportional to stratum size
