"""Unit tests for operators/weaklabel.py — Snorkel-style LF diagnostics.

A hand-built corpus pins every semantic branch: positive/negative/
abstain votes per LF, overlap vs conflict counting, the majority-vote
consensus with ties -> NULL, zero-coverage LFs still reporting via the
spine, and the consensus frame a learned filter trains on.
"""

import pytest

from pipeline_pyspark_etl_imdb_spark.operators.weaklabel import (
    LF_NAMES,
    weak_label_consensus,
    weak_label_report,
)

# Crafted docs (the en-stoplist contains 'the', 'a', 'of', 'and', 'is'...):
# d0: long, stopword-rich, clean    -> several positive votes, no negatives
# d1: short (< 10 tokens), no stops -> negative lf_length, abstains else
# d2: highly repetitive             -> lf_distinct=0; length positive if
#                                      >= 30 tokens -> conflict
# d3: one token                     -> lf_length=0 only (plus quality vote)
_D0 = (
    "the cat sat on the mat and the dog ran to the park while the sun was "
    "warm and the wind was soft over the hills and the fields of green "
    "grass where the children play games all day long"
)
_D1 = "zzz qqq vvv www"
_D2 = ("spam " * 40).strip()
_D3 = "hello"


@pytest.fixture(scope="module")
def report(spark):
    docs = spark.createDataFrame(
        [(0, _D0), (1, _D1), (2, _D2), (3, _D3)], "doc_id long, text string"
    )
    rows = weak_label_report(docs).collect()
    return {r.lf: r for r in rows}


def test_every_lf_reports_even_with_zero_votes(report):
    assert set(report) == set(LF_NAMES)
    for r in report.values():
        assert r.n_docs == 4
    # nothing in the corpus is punctuation-heavy
    punct = report["lf_punct"]
    assert punct.n_votes == 0
    assert punct.coverage == 0.0
    assert punct.n_overlap == 0 and punct.n_conflict == 0
    assert punct.agree_consensus is None


def test_vote_and_overlap_counting(report):
    # lf_length votes on d0 (+), d1 (-), d2 (+), d3 (-): coverage 1.0
    length = report["lf_length"]
    assert length.n_votes == 4
    assert length.coverage == 1.0
    # d0: lf_quality/lf_english also vote -> overlap; d2: lf_distinct
    # votes -> overlap; d1/d3 depend on quality votes — every doc here
    # gets >= 2 votes, so overlap = 4
    assert length.n_overlap == 4


def test_conflict_is_opposite_vote_only(report):
    # d2: lf_length=1 (40 tokens) vs lf_distinct=0 (1 distinct token)
    # is a genuine conflict for both sides
    assert report["lf_distinct"].n_conflict >= 1
    assert report["lf_length"].n_conflict >= 1
    # lf_english only votes on d0 where no LF votes 0 -> no conflict
    assert report["lf_english"].n_conflict == 0


def test_consensus_majority_and_agreement(spark):
    docs = spark.createDataFrame(
        [(0, _D0), (1, _D1), (2, _D2), (3, _D3)], "doc_id long, text string"
    )
    cons = {r.doc_id: r for r in weak_label_consensus(docs).collect()}
    # d0: positives only -> label 1
    assert cons[0].label == 1 and cons[0].neg_votes == 0
    # d1: zzz-words, 4 tokens: lf_length=0, lf_quality negative
    # (stop_ratio 0, short) -> label 0
    assert cons[1].label == 0 and cons[1].pos_votes == 0
    # d3: single token: negatives only -> label 0
    assert cons[3].label == 0
    # every doc gets exactly one row
    assert sorted(cons) == [0, 1, 2, 3]


def test_tie_yields_null_label(spark):
    # d2 engineered: lf_length=1 (40 tokens) vs lf_distinct=0 and
    # lf_quality: 'spam'*40 -> no stopwords, length term 0.4*0.5=0.2 +
    # 0.2 punct term -> quality 0.4 -> abstain; so 1 pos vs 1 neg = tie
    docs = spark.createDataFrame([(2, _D2)], "doc_id long, text string")
    row = weak_label_consensus(docs).collect()[0]
    assert row.pos_votes == row.neg_votes == 1
    assert row.label is None


def test_report_fractions_are_count_ratios(report):
    for r in report.values():
        assert r.coverage == pytest.approx(r.n_votes / 4)
        assert r.overlap == pytest.approx(r.n_overlap / 4)
        assert r.conflict == pytest.approx(r.n_conflict / 4)
