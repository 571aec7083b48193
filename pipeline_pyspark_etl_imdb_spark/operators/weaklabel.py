"""Weak supervision: labeling-function diagnostics and consensus labels
(the Snorkel label-model workflow, Ratner et al. 2017, applied to corpus
quality curation).

Production training-data pipelines bootstrap quality classifiers from
WEAK LABELS: a handful of cheap heuristic labeling functions (LFs) vote
keep(1) / drop(0) / abstain(NULL) per document, the votes aggregate into
a consensus label, and the per-LF diagnostics — coverage, overlap,
conflict, consensus agreement — are the table an engineer reads to
decide which heuristics to trust before training the learned filter
(operators/classifier.py is the downstream consumer of exactly such
labels: train on the consensus seed, score everything).

The five LFs here are deterministic expressions over the same signals
the text-quality family already exposes (token counts, stopword hits,
punctuation ratio, distinct-token ratio, the composite quality score):

- ``lf_quality``:   1 if quality >= 0.60, 0 if quality <= 0.35
- ``lf_length``:    1 if n_tokens >= 30,  0 if n_tokens < 10
- ``lf_english``:   1 if >= 3 tokens hit the English stoplist
                    (positive-only: it can vouch, not condemn)
- ``lf_punct``:     0 if punct_ratio > 0.10 (negative-only)
- ``lf_distinct``:  0 if distinct-token ratio < 0.5 (2*(n-d) > n,
                    integer-exact repetition flag)

everything else abstains (NULL).

Engine-exactness: every vote is either an INTEGER comparison or a
comparison on a double the two engines compute from the IDENTICAL
expression tree (the quality_score discipline — exact counts, correctly
rounded casts/divides, same association), so votes are bit-portable and
the whole report hash-matches the DuckDB oracle with no margin
analysis. Zero-length/zero-token docs are excluded from ratio votes by
integer guards BEFORE any division (the anova_report 0/0 discipline —
Spark yields NULL on divide-by-zero where DuckDB yields IEEE NaN).

Physical shape (the 100 TB one): ONE map-only pass computes the five
vote columns and the per-doc vote summary (pos/neg counts — plain
column arithmetic, no shuffle); the per-LF report is one explode to
(doc, lf, vote) rows followed by ONE partial-aggregated groupBy on the
5-value lf key. Nothing corpus-sized shuffles twice, nothing reaches
the driver.

Definitions (Snorkel LFAnalysis):
- coverage(lf)  = docs where lf votes / n_docs
- overlap(lf)   = docs where lf votes AND >= 1 other LF votes / n_docs
- conflict(lf)  = docs where lf votes AND >= 1 other LF votes the
                  OPPOSITE way / n_docs
- consensus     = majority of non-abstain votes (ties and all-abstain
                  -> NULL); agree_consensus(lf) = among docs where lf
                  votes and consensus is non-NULL, the fraction where
                  the vote equals the consensus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.text import (
    LANG_STOPWORDS,
    quality_expr,
    tokens,
)

LF_NAMES = ("lf_quality", "lf_length", "lf_english", "lf_punct", "lf_distinct")


def _vote_columns(text_col: str):
    """The five LF vote expressions (1 / 0 / NULL) over a lowercased
    text column; guarded so no ratio divides by zero anywhere."""
    t = F.lower(F.col(text_col))
    tok = tokens(t)
    n_tokens = F.size(tok)
    n_distinct = F.size(F.array_distinct(tok))
    en_stop = F.array([F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.filter(tok, lambda x: F.array_contains(en_stop, x)))
    n_chars = F.length(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, "[^a-z0-9\\s]", ""))
    ratio_ok = (n_chars > 0) & (n_tokens > 0)
    q = quality_expr(F.col(text_col))
    one, zero = F.lit(1), F.lit(0)
    null = F.lit(None).cast("int")
    return {
        "lf_quality": F.when(ratio_ok & (q >= 0.60), one)
        .when(ratio_ok & (q <= 0.35), zero)
        .otherwise(null),
        "lf_length": F.when(n_tokens >= 30, one)
        .when(n_tokens < 10, zero)
        .otherwise(null),
        "lf_english": F.when(n_stop >= 3, one).otherwise(null),
        "lf_punct": F.when(
            ratio_ok & (n_punct * 10 > n_chars), zero
        ).otherwise(null),
        "lf_distinct": F.when(
            (n_tokens > 0) & ((n_tokens - n_distinct) * 2 > n_tokens), zero
        ).otherwise(null),
    }


def weak_label_report(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per labeling function: (lf, n_docs, n_votes, coverage,
    n_overlap, overlap, n_conflict, conflict, n_agree, agree_consensus),
    ordered by lf. See module docstring for the definitions."""
    votes = _vote_columns(text_col)
    wide = docs.select(
        F.col(id_col).alias("doc_id"),
        *[expr.alias(name) for name, expr in votes.items()],
    )
    vote_cols = [F.col(n) for n in LF_NAMES]
    pos = sum((F.when(c == 1, 1).otherwise(0) for c in vote_cols), F.lit(0))
    neg = sum((F.when(c == 0, 1).otherwise(0) for c in vote_cols), F.lit(0))
    consensus = (
        F.when(pos > neg, F.lit(1)).when(neg > pos, F.lit(0)).otherwise(
            F.lit(None).cast("int")
        )
    )
    summarized = wide.select(
        "doc_id",
        *LF_NAMES,
        pos.alias("__pos"),
        neg.alias("__neg"),
        (pos + neg).alias("__nv"),
        consensus.alias("__consensus"),
    )
    long = summarized.select(
        "doc_id",
        "__pos",
        "__neg",
        "__nv",
        "__consensus",
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(n) for n in LF_NAMES]),
                F.array(*[F.col(n) for n in LF_NAMES]),
            )
        ).alias("lf", "vote"),
    )
    voted = long.where(F.col("vote").isNotNull())
    opposite = F.when(F.col("vote") == 1, F.col("__neg") >= 1).otherwise(
        F.col("__pos") >= 1
    )
    # corpus size as an in-plan one-row broadcast (no driver action; the
    # global product gate whitelists this bounded-broadcast shape).
    # Counted off the RAW docs frame, not the vote projection, so this
    # branch prunes to a count-star scan instead of re-running the
    # tokenize/vote expressions a second time.
    totals = docs.agg(F.count("*").cast("bigint").alias("__n_docs"))
    agg = voted.groupBy("lf").agg(
        F.count("*").cast("bigint").alias("n_votes"),
        F.count_if(F.col("__nv") >= 2).cast("bigint").alias("n_overlap"),
        F.count_if(opposite).cast("bigint").alias("n_conflict"),
        F.count_if(F.col("vote") == F.col("__consensus"))
        .cast("bigint")
        .alias("n_agree"),
        F.count_if(F.col("__consensus").isNotNull())
        .cast("bigint")
        .alias("__n_consensus"),
    )
    # 5-row LF spine: an LF that never fires must still REPORT (a
    # zero-coverage row is the diagnostic — silently vanishing from the
    # groupBy is how a dead heuristic escapes review)
    spine = docs.sparkSession.createDataFrame(
        [(n,) for n in LF_NAMES], "lf: string"
    )
    zero = F.lit(0).cast("bigint")
    report = (
        spine.join(agg, "lf", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "lf",
            F.col("__n_docs").alias("n_docs"),
            F.coalesce("n_votes", zero).alias("n_votes"),
            (
                F.coalesce("n_votes", zero).cast("double")
                / F.col("__n_docs").cast("double")
            ).alias("coverage"),
            F.coalesce("n_overlap", zero).alias("n_overlap"),
            (
                F.coalesce("n_overlap", zero).cast("double")
                / F.col("__n_docs").cast("double")
            ).alias("overlap"),
            F.coalesce("n_conflict", zero).alias("n_conflict"),
            (
                F.coalesce("n_conflict", zero).cast("double")
                / F.col("__n_docs").cast("double")
            ).alias("conflict"),
            F.coalesce("n_agree", zero).alias("n_agree"),
            F.when(
                F.col("__n_consensus") > 0,
                F.col("n_agree").cast("double") / F.col("__n_consensus"),
            ).alias("agree_consensus"),
        )
        .orderBy("lf")
    )
    return report


def weak_label_consensus(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document consensus labels: (id, pos_votes, neg_votes, label)
    with label NULL on ties/all-abstain — the seed frame a learned
    filter trains on (train_doc_classifier consumes exactly this
    shape). Map-only: no shuffle, no action."""
    votes = _vote_columns(text_col)
    wide = docs.select(
        F.col(id_col), *[expr.alias(name) for name, expr in votes.items()]
    )
    vote_cols = [F.col(n) for n in LF_NAMES]
    pos = sum((F.when(c == 1, 1).otherwise(0) for c in vote_cols), F.lit(0))
    neg = sum((F.when(c == 0, 1).otherwise(0) for c in vote_cols), F.lit(0))
    return wide.select(
        id_col,
        pos.cast("int").alias("pos_votes"),
        neg.cast("int").alias("neg_votes"),
        F.when(pos > neg, F.lit(1))
        .when(neg > pos, F.lit(0))
        .otherwise(F.lit(None).cast("int"))
        .alias("label"),
    )
