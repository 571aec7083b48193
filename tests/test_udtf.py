"""Python UDTF surface: LATERAL segmenter semantics and edge cases."""

from __future__ import annotations

from pipeline_pyspark_etl_imdb_spark.operators.udtf import segment_documents


def test_segment_documents_windows_and_remainder(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x"), (3, None), (4, "")],
        "doc_id long, text string",
    )
    rows = sorted(
        tuple(r) for r in segment_documents(docs, max_tokens=2).collect()
    )
    # doc 1: 3 windows (last short); doc 2: 1 window; NULL/empty: no rows
    assert rows == [
        (1, 0, 2, "a b"),
        (1, 1, 2, "c d"),
        (1, 2, 1, "e"),
        (2, 0, 1, "x"),
    ]


def test_segment_documents_is_map_only(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        segment_documents(docs, max_tokens=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # UDTF runs inside the scan stage
