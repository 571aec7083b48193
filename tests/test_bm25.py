"""BM25 pinned against a hand-computed example and sanity-checked on the
fixture corpus; contrastive negatives checked for determinism, group
exclusion, and exact-k; l-diversity pinned against hand-built classes."""

import math

import pytest
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.corpus import contrastive_negatives
from pipeline_pyspark_etl_imdb_spark.operators.text import bm25_scores
from pipeline_pyspark_etl_imdb_spark.operators.warehouse import l_diversity_audit
from tests.conftest import SF_ORACLE


def test_bm25_hand_computed(spark):
    # 3 docs; query = {"cat"}; df(cat)=2, N=3, dl = 2, 3, 2; avgdl = 7/3
    docs = spark.createDataFrame(
        [(1, "cat dog"), (2, "cat cat fish"), (3, "bird fish")],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in bm25_scores(docs, ["cat"], k1=1.2, b=0.75).collect()}
    assert set(got) == {1, 2}
    idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)
    avgdl = 7.0 / 3.0

    def s(tf, dl):
        return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

    assert got[1].score == pytest.approx(s(1, 2), rel=1e-12)
    assert got[2].score == pytest.approx(s(2, 3), rel=1e-12)
    assert got[1].n_matched == 1 and got[2].n_matched == 1


def test_bm25_rare_term_outranks_common(spark):
    # same tf and dl: the rarer term must contribute a higher score
    docs = spark.createDataFrame(
        [(i, "common filler") for i in range(1, 9)]
        + [(9, "rare filler"), (10, "common filler")],
        "doc_id bigint, text string",
    )
    common = {r.doc_id: r.score for r in bm25_scores(docs, ["common"]).collect()}
    rare = {r.doc_id: r.score for r in bm25_scores(docs, ["rare"]).collect()}
    assert rare[9] > common[1]


def test_bm25_fixture_is_deterministic_and_bounded(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    out = bm25_scores(docs, ["vector", "hash", "merge"])
    a = [(r.doc_id, r.score) for r in out.collect()]
    b = [(r.doc_id, r.score) for r in out.collect()]
    assert a == b
    assert all(r[1] >= 0 for r in a)  # +1 idf variant never goes negative
    assert len(a) <= docs.count()


def test_contrastive_negatives_contract(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    anchors = [1, 2, 3]
    out = contrastive_negatives(docs, anchors, k=4).collect()
    by_anchor: dict = {}
    langs = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    for r in out:
        by_anchor.setdefault(r.anchor_id, []).append(r)
        # negatives always come from a different group
        assert langs[r.negative_id] != langs[r.anchor_id]
    assert set(by_anchor) == set(anchors)
    for rows in by_anchor.values():
        assert sorted(r.rk for r in rows) == [1, 2, 3, 4]
    # determinism
    again = contrastive_negatives(docs, anchors, k=4).collect()
    assert {(r.anchor_id, r.negative_id, r.rk) for r in out} == {
        (r.anchor_id, r.negative_id, r.rk) for r in again
    }


def test_contrastive_negatives_stable_under_growth(spark):
    """A kept negative only ever gets displaced by a new smaller-hash
    candidate, never reshuffled: the k=2 set is a prefix-superset check
    against k=4."""
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    k2 = {
        (r.anchor_id, r.negative_id)
        for r in contrastive_negatives(docs, [1, 2], k=2).collect()
    }
    k4 = {
        (r.anchor_id, r.negative_id)
        for r in contrastive_negatives(docs, [1, 2], k=4).collect()
    }
    assert k2 <= k4


def test_l_diversity_hand_built(spark):
    rows = (
        [("a", "s1")] * 3 + [("a", "s2")] * 2  # diverse (2 distinct)
        + [("b", "s1")] * 4                     # homogeneous (1 distinct)
        + [("c", "s3")] * 1                     # homogeneous singleton
    )
    df = spark.createDataFrame(rows, "qa string, sens string")
    got = l_diversity_audit(df, ["qa"], "sens", l=2).collect()[0]
    assert got.n_groups == 3
    assert got.violating_groups == 2
    assert got.rows_at_risk == 5
    assert got.min_distinct == 1
    assert got.max_distinct == 2


def test_l_diversity_null_sensitive_counts_once(spark):
    df = spark.createDataFrame(
        [("g", None), ("g", None), ("g", "x")], "qa string, sens string"
    )
    got = l_diversity_audit(df, ["qa"], "sens", l=3).collect()[0]
    # NULL is one distinct sensitive value under dropDuplicates semantics
    assert got.min_distinct == 2
    assert got.violating_groups == 1


def test_rag_chunk_bm25_contract(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.text import rag_chunk_bm25

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    out = rag_chunk_bm25(docs, ["vector", "hash", "merge"], k=20).collect()
    assert len(out) == 20
    # scores non-increasing at the 6-decimal cut resolution
    scores = [round(r.score, 6) for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(r.n_matched >= 1 for r in out)
    # determinism
    again = rag_chunk_bm25(docs, ["vector", "hash", "merge"], k=20).collect()
    assert [(r.doc_id, r.chunk_idx) for r in out] == [
        (r.doc_id, r.chunk_idx) for r in again
    ]


def test_rag_chunk_bm25_composite_id_scoring_matches_whole_doc_when_one_chunk(spark):
    """A corpus where every doc fits one chunk: chunk-level BM25 equals
    doc-level BM25 (chunk_idx 0 everywhere)."""
    from pipeline_pyspark_etl_imdb_spark.operators.text import (
        bm25_scores,
        rag_chunk_bm25,
    )

    docs = spark.createDataFrame(
        [(1, "cat dog"), (2, "cat cat fish"), (3, "bird fish")],
        "doc_id bigint, text string",
    )
    chunked = {
        (r.doc_id, round(r.score, 9)): r.chunk_idx
        for r in rag_chunk_bm25(docs, ["cat"], k=10, max_tokens=64).collect()
    }
    whole = {
        (r.doc_id, round(r.score, 9))
        for r in bm25_scores(docs, ["cat"]).collect()
    }
    assert set(chunked) == whole
    assert all(v == 0 for v in chunked.values())
