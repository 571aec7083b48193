"""RRF hybrid retrieval gates: fusion beats single-system presence, and
the rankers cut via TakeOrderedAndProject before any global window."""

import pytest
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.retrieval import hybrid_rrf
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def fixture_frames(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    return docs, emb


def test_rrf_scores_and_ranks_consistent(fixture_frames):
    docs, emb = fixture_frames
    out = hybrid_rrf(docs, emb, ["vector", "hash", "merge"]).collect()
    assert 0 < len(out) <= 20
    for r in out:
        want = 0.0
        if r.lex_rank is not None:
            want += 1.0 / (60 + r.lex_rank)
        if r.sem_rank is not None:
            want += 1.0 / (60 + r.sem_rank)
        assert r.rrf_score == pytest.approx(want)
        assert r.lex_rank is not None or r.sem_rank is not None
    scores = [r.rrf_score for r in out]
    assert scores == sorted(scores, reverse=True)


def test_dual_presence_beats_single_at_same_rank(fixture_frames):
    docs, emb = fixture_frames
    out = hybrid_rrf(docs, emb, ["vector", "hash", "merge"]).collect()
    both = [r for r in out if r.lex_rank is not None and r.sem_rank is not None]
    only = [r for r in out if (r.lex_rank is None) != (r.sem_rank is None)]
    for b in both:
        for o in only:
            o_rank = o.lex_rank if o.lex_rank is not None else o.sem_rank
            if max(b.lex_rank, b.sem_rank) <= o_rank:
                assert b.rrf_score > o.rrf_score


def test_plan_take_ordered_not_global_sort(fixture_frames):
    docs, emb = fixture_frames
    plan = (
        hybrid_rrf(docs, emb, ["vector", "hash", "merge"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
