"""Incremental-ingestion dedup: exact-vs-LSH candidate paths.

The LSH path can only MISS near-dup pairs (recall < 1), never invent
them, so its kept set must be a superset of the exact path's; on this
fixture at threshold 0.8 the banding parameters give full recall, so the
two paths agree exactly. Also pins the dedup semantics on a hand-built
case (corpus dup, in-batch dup, near-dup, fresh doc).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.neardup import incremental_ingest_dedup

SF_ORACLE = "/root/testdata/sf0.01"


def test_hand_built_semantics(spark):
    corpus = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # exact dup of corpus
            (3, "totally different words here now ok"),  # fresh (kept, min id)
            (5, "totally different words here now ok"),  # in-batch dup of 3
            (7, "alpha beta gamma delta epsilon eta"),  # near-dup of corpus
            (9, "unrelated content that matches nothing"),  # fresh
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r.doc_id for r in incremental_ingest_dedup(batch, corpus, threshold=0.5).collect()
    )
    assert kept == [3, 9]


@pytest.mark.parametrize("threshold", [0.8])
def test_lsh_path_is_superset_and_agrees_on_fixture(spark, threshold):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    batch = docs.where(F.col("doc_id") % 2 == 1)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    exact = {
        r.doc_id
        for r in incremental_ingest_dedup(
            batch, corpus, threshold=threshold, candidate_source="exact"
        ).collect()
    }
    lsh = {
        r.doc_id
        for r in incremental_ingest_dedup(
            batch, corpus, threshold=threshold, candidate_source="lsh"
        ).collect()
    }
    assert exact <= lsh  # LSH can only miss removals, never add them
    assert exact == lsh  # banding at these params has full recall here
