"""Engine-divergence edges the r6 ADVICE flagged, pinned on BOTH sides.

Two latent Spark-vs-DuckDB divergences lived in oracle SQL, invisible on
the stock fixtures and HIDDEN by the local harness (oracle_utils
canonicalizes NaN to None, but the driver hashes stringified values, so
a DuckDB NaN vs a Spark NULL is a driver-red the local suite can't see):

- zero-norm embeddings: Spark's ``dot/(na*nb)`` divides by zero and
  yields NULL (pair never compares -> row kept), while DuckDB's
  ``list_cosine_similarity`` yields NaN, and NaN compares greater-than
  in DuckDB (row dropped). Fixed with an ``isfinite(cos)`` guard in the
  semdedup_kmeans / semdedup_lsh / embedding_neardup prunes.
- empty corpus: weak_label_report's coverage/overlap/conflict ratios
  were ``count / n_docs`` unguarded — DuckDB 0/0 = NaN (IEEE), Spark
  0/0 = NULL. Fixed with ``CASE WHEN n_docs > 0`` guards mirroring the
  agree_consensus column.

These tests build the degenerate fixtures the stock data lacks and
assert (a) the raw DuckDB output carries NULL, never NaN, and (b) the
Spark and oracle results agree value-for-value.
"""

import math

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pipeline_pyspark_etl_imdb_spark.plans.oracles import ORACLES
from pipeline_pyspark_etl_imdb_spark.plans.registry import QUERIES
from tests.oracle_utils import compare_frames


def _write_embeddings(tmp_path, rows):
    t = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * len(rows), pa.int32()),
        }
    )
    pq.write_table(t, f"{tmp_path}/embeddings.parquet")


def _write_empty_documents(tmp_path):
    t = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
            "source": pa.array([], pa.string()),
            "n_chars": pa.array([], pa.int64()),
        }
    )
    pq.write_table(t, f"{tmp_path}/documents.parquet")


def _conn_for(tmp_path, tables):
    conn = duckdb.connect()
    for name in tables:
        conn.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{tmp_path}/{name}.parquet')"
        )
    return conn


def test_semdedup_zero_norm_vectors_kept_on_both_engines(spark, tmp_path):
    # two identical non-zero vectors (same cluster via the lower-id
    # argmin tie-break; cos = 1 -> the higher id drops) and two ZERO
    # vectors (same cluster the same way; cos is 0/0 -> must never
    # compare, so BOTH stay kept)
    _write_embeddings(
        tmp_path,
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0, 0.0]),
            (3, [0.0, 0.0, 0.0, 0.0]),
            (4, [0.0, 0.0, 0.0, 0.0]),
        ],
    )
    spark_pdf = QUERIES["semdedup_kmeans"](spark, str(tmp_path)).toPandas()
    conn = _conn_for(tmp_path, ["embeddings"])
    oracle_pdf = conn.execute(ORACLES["semdedup_kmeans"]).df()

    kept = dict(zip(spark_pdf["vec_id"], spark_pdf["is_kept"]))
    assert kept == {1: True, 2: False, 3: True, 4: True}
    # raw oracle agreement BEFORE canonicalization (the driver-visible
    # signal): the zero-norm rows must be kept on the DuckDB side too
    raw = {r[0]: r[2] for r in conn.execute(ORACLES["semdedup_kmeans"]).fetchall()}
    assert raw == {1: True, 2: False, 3: True, 4: True}
    assert compare_frames(spark_pdf, oracle_pdf) == []


def test_weak_label_report_empty_corpus_null_not_nan(spark, tmp_path):
    _write_empty_documents(tmp_path)
    spark_pdf = QUERIES["weak_label_report"](spark, str(tmp_path)).toPandas()
    conn = _conn_for(tmp_path, ["documents"])
    oracle_pdf = conn.execute(ORACLES["weak_label_report"]).df()

    # the 5-row LF spine survives an empty corpus on both sides
    assert len(spark_pdf) == 5 and len(oracle_pdf) == 5
    # raw oracle values: the ratio columns must be NULL (None), never
    # NaN — the driver stringifies, so 'nan' vs 'None' is a hash red
    for row in conn.execute(ORACLES["weak_label_report"]).fetchall():
        for v in row:
            assert not (isinstance(v, float) and math.isnan(v)), row
    for col in ("coverage", "overlap", "conflict", "agree_consensus"):
        assert spark_pdf[col].isna().all(), col
        assert oracle_pdf[col].isna().all(), col
    assert compare_frames(spark_pdf, oracle_pdf) == []
