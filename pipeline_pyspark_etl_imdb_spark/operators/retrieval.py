"""Hybrid retrieval: reciprocal-rank fusion of a lexical ranker (Okapi
BM25) and a semantic ranker (embedding cosine) — the standard RAG
retrieval stack (Cormack et al. 2009 RRF: rank-based fusion needs no
score calibration between systems, which is why it beats score
averaging across heterogeneous rankers).

    rrf(d) = Σ_systems 1 / (k + rank_system(d))

Exactness: ranks are integers (ties broken by id), each RRF term is one
double division, and a document accumulates at most |systems| terms in
a fixed coalesce order — bit-identical cross-engine, oracle-backed.

Physical shape (survives 100 TB):
- each ranker cuts to its top-N via orderBy+limit — TakeOrderedAndProject
  (per-partition top-N, driver merge), so the rank windows that follow
  see N rows, not the corpus; no partition-less window ever touches
  corpus-sized data;
- the semantic side broadcasts the single query vector (1-row cross
  join) and scores map-only — the brute-force twin of the ANN path
  (similarity.ann_*), which is the drop-in at scale;
- fusion is a full outer join of two N-row frames — trivially
  broadcast. Missing-in-one-system documents keep their other term
  (coalesce 0), the defining RRF behavior."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.text import bm25_scores


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def hybrid_rrf(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec_id: int = 7,
    top_per_system: int = 50,
    top_k: int = 20,
    rrf_k: int = 60,
) -> DataFrame:
    """(doc_id, lex_rank, sem_rank, rrf_score): top-``top_k`` fusion of
    BM25(query_terms) and cosine-to-embedding(query_vec_id), assuming
    the fixture's doc_id == vec_id alignment."""
    lex_top = (
        bm25_scores(docs, query_terms)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(top_per_system)
    )
    w_lex = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    lex = lex_top.select(
        "doc_id", F.row_number().over(w_lex).alias("lex_rank")
    )
    qv = (
        embeddings.where(F.col("vec_id") == query_vec_id)
        .select(
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("__q")
        )
    )
    scored = (
        embeddings.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            (
                _dot(
                    F.transform(F.col("embedding"), lambda x: x.cast("double")),
                    F.col("__q"),
                )
                / (
                    F.sqrt(
                        _dot(
                            F.transform(
                                F.col("embedding"), lambda x: x.cast("double")
                            ),
                            F.transform(
                                F.col("embedding"), lambda x: x.cast("double")
                            ),
                        )
                    )
                    * F.sqrt(_dot(F.col("__q"), F.col("__q")))
                )
            ).alias("__cos"),
        )
    )
    sem_top = scored.orderBy(F.desc("__cos"), F.asc("doc_id")).limit(top_per_system)
    w_sem = Window.orderBy(F.desc("__cos"), F.asc("doc_id"))
    sem = sem_top.select("doc_id", F.row_number().over(w_sem).alias("sem_rank"))
    fused = lex.join(sem, "doc_id", "full_outer")
    term = lambda rank_col: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(rrf_k) + F.col(rank_col)), F.lit(0.0)
    )
    return (
        fused.select(
            "doc_id",
            "lex_rank",
            "sem_rank",
            (term("lex_rank") + term("sem_rank")).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(top_k)
    )
