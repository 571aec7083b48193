"""dataset_split: determinism, growth stability, proportions;
k_anonymity_audit: pinned against hand-built equivalence classes."""

import pytest
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.corpus import dataset_split
from pipeline_pyspark_etl_imdb_spark.operators.warehouse import k_anonymity_audit
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_ORACLE}/documents.parquet")


def test_split_total_and_determinism(docs):
    a = {r.doc_id: r.split for r in dataset_split(docs).collect()}
    b = {r.doc_id: r.split for r in dataset_split(docs).collect()}
    assert a == b
    assert len(a) == docs.count()


def test_split_proportions_near_ratios(docs):
    n = docs.count()
    counts = {
        r.split: r.c
        for r in dataset_split(docs).groupBy("split").agg(F.count("*").alias("c")).collect()
    }
    assert set(counts) <= {"train", "val", "test"}
    # binomial tolerance: 4 sigma of sqrt(p(1-p)/n)
    for name, p in (("train", 0.9), ("val", 0.05), ("test", 0.05)):
        share = counts.get(name, 0) / n
        tol = 4 * (p * (1 - p) / n) ** 0.5
        assert abs(share - p) <= tol, (name, share)


def test_split_stable_under_corpus_growth(docs):
    """Adding documents never reassigns an existing id — the eval-set
    contamination guard."""
    subset = docs.where(F.col("doc_id") % 3 == 0)
    full = {r.doc_id: r.split for r in dataset_split(docs).collect()}
    sub = {r.doc_id: r.split for r in dataset_split(subset).collect()}
    assert all(full[i] == s for i, s in sub.items())


def test_split_custom_ratios_cover_all_rows(docs):
    out = dataset_split(docs, ratios={"a": 0.5, "b": 0.5})
    assert out.where(F.col("split").isNull()).count() == 0
    assert set(r.split for r in out.select("split").distinct().collect()) == {"a", "b"}


def test_k_anonymity_hand_built(spark):
    rows = (
        [("x", 1)] * 7          # safe class (n=7)
        + [("x", 2)] * 3        # violating (n=3)
        + [("y", 1)] * 1        # violating (n=1)
        + [(None, None)] * 2    # NULL class, violating (n=2)
    )
    df = spark.createDataFrame(rows, "qa string, qb int")
    got = k_anonymity_audit(df, ["qa", "qb"], k=5).collect()[0]
    assert got.n_groups == 4
    assert got.violating_groups == 3
    assert got.rows_at_risk == 6
    assert got.min_group_size == 1
    assert got.max_group_size == 7


def test_k_anonymity_all_safe(spark):
    df = spark.createDataFrame([("g", i % 2) for i in range(20)], "qa string, qb int")
    got = k_anonymity_audit(df, ["qa", "qb"], k=5).collect()[0]
    assert got.violating_groups == 0
    assert got.rows_at_risk == 0


def test_privacy_audits_empty_input_zero_counters(spark):
    from pyspark.sql.types import StructType, StructField, StringType, IntegerType

    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import (
        k_anonymity_audit,
        l_diversity_audit,
    )

    schema = StructType(
        [StructField("qa", StringType()), StructField("qb", IntegerType())]
    )
    empty = spark.createDataFrame([], schema)
    got = k_anonymity_audit(empty, ["qa"], k=5).collect()[0]
    assert (got.n_groups, got.violating_groups, got.rows_at_risk) == (0, 0, 0)
    assert got.min_group_size is None
    got2 = l_diversity_audit(empty, ["qa"], "qb", l=2).collect()[0]
    assert (got2.n_groups, got2.violating_groups, got2.rows_at_risk) == (0, 0, 0)
