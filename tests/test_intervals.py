"""Interval-union operator and deterministic exact-k global sampling.

merge_intervals: hand-built overlap/touch/disjoint cases (unit) plus the
registry query's oracle (tests/test_entry_oracle.py covers the full-table
hash match — here we pin the edge semantics the SQL can't show).
global_hash_sample: exact size, determinism across repartitionings, and
the TakeOrderedAndProject plan shape (no global sort at 100 TB).
"""

from __future__ import annotations

from pipeline_pyspark_etl_imdb_spark.operators import corpus
from pipeline_pyspark_etl_imdb_spark.operators.eventtime import merge_intervals

SF_ORACLE = "/root/testdata/sf0.01"


def test_merge_intervals_semantics(spark):
    rows = [
        # key 1: [0,10] overlaps [5,20]; [20,30] touches (20 == prior end)
        # and merges (closed-interval semantics); [40,50] disjoint
        (1, 0, 10),
        (1, 5, 20),
        (1, 20, 30),
        (1, 40, 50),
        # key 2: contained interval [5,6] inside [0,100]; later [50,60]
        # still inside — prior-MAX-end (not lag) must keep the span open
        (2, 0, 100),
        (2, 5, 6),
        (2, 50, 60),
        (2, 150, 160),
    ]
    df = spark.createDataFrame(rows, "user_id long, start_us long, end_us long")
    got = [tuple(r) for r in merge_intervals(df).collect()]
    assert got == [
        (1, 1, 0, 30, 3),
        (1, 2, 40, 50, 1),
        (2, 1, 0, 100, 3),
        (2, 2, 150, 160, 1),
    ]


def test_merge_intervals_single_and_tied_rows(spark):
    rows = [(1, 7, 9), (2, 3, 5), (2, 3, 5)]  # exact duplicate interval
    df = spark.createDataFrame(rows, "user_id long, start_us long, end_us long")
    got = [tuple(r) for r in merge_intervals(df).collect()]
    assert got == [(1, 1, 7, 9, 1), (2, 1, 3, 5, 2)]


def test_global_hash_sample_exact_k_and_deterministic(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    k = 37
    a = sorted(r.doc_id for r in corpus.global_hash_sample(docs, k=k).select("doc_id").collect())
    b = sorted(
        r.doc_id
        for r in corpus.global_hash_sample(docs.repartition(13), k=k)
        .select("doc_id")
        .collect()
    )
    assert len(a) == k
    assert a == b  # kept set independent of partitioning


def test_weighted_hash_sample_biases_toward_weight(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    k = 100
    sample = corpus.weighted_hash_sample(docs, k=k, weight_col="n_chars")
    rows = sample.select("doc_id", "n_chars").collect()
    assert len(rows) == k
    # deterministic across partitionings
    again = sorted(
        r.doc_id
        for r in corpus.weighted_hash_sample(
            docs.repartition(11), k=k, weight_col="n_chars"
        ).collect()
    )
    assert sorted(r.doc_id for r in rows) == again
    # P(select) ∝ n_chars, so the sample's mean length must exceed the
    # corpus mean (fixed fixture -> deterministic assertion)
    corpus_mean = docs.agg({"n_chars": "avg"}).collect()[0][0]
    sample_mean = sum(r.n_chars for r in rows) / k
    assert sample_mean > corpus_mean


def test_global_hash_sample_plans_take_ordered(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    plan = corpus.global_hash_sample(docs, k=100)._jdf.queryExecution().executedPlan().toString()
    # per-partition top-k merged at the driver — a global Sort here would
    # shuffle the entire table to rank 100 rows
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_merge_intervals_property_vs_python_reference(spark):
    from hypothesis import given, settings, strategies as st

    iv = st.tuples(
        st.integers(1, 3),  # key
        st.integers(0, 50),  # start
        st.integers(0, 20),  # length
    )

    def py_merge(rows):
        out = {}
        by_key = {}
        for k, s, ln in rows:
            by_key.setdefault(k, []).append((s, s + ln))
        for k, spans in by_key.items():
            spans.sort()
            merged = []
            for s, e in spans:
                if merged and s <= merged[-1][1]:
                    merged[-1] = (merged[-1][0], max(merged[-1][1], e))
                else:
                    merged.append((s, e))
            out[k] = merged
        return {
            (k, i + 1, s, e)
            for k, spans in out.items()
            for i, (s, e) in enumerate(spans)
        }

    @settings(max_examples=20, deadline=None)
    @given(st.lists(iv, min_size=1, max_size=30))
    def check(rows):
        df = spark.createDataFrame(
            [(k, s, s + ln) for k, s, ln in rows],
            "user_id long, start_us long, end_us long",
        )
        got = {
            (r.user_id, r.span_idx, r.start_us, r.end_us)
            for r in merge_intervals(df).collect()
        }
        assert got == py_merge(rows)

    check()


def test_weighted_hash_sample_plans_take_ordered(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    plan = (
        corpus.weighted_hash_sample(docs, k=100, weight_col="n_chars")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
