"""Distributed unigram-LM tokenizer training (SentencePiece's model;
Kudo 2018) — the FIFTH iterative-algorithm shape. CC iterates a min
label, PageRank a mass, k-means float centroids, BPE a discrete merge
list; the unigram LM iterates a PROBABILITY TABLE refined by hard-EM
(Viterbi) segmentation rounds with vocabulary pruning.

Simplifications vs SentencePiece, documented so the contract is exact:
hard-EM (Viterbi counts) instead of lattice posteriors, and candidate
pieces are substrings up to ``max_piece_len`` — both standard
reductions that keep every step integer/float-deterministic. The test
suite pins the whole trainer against an independent pure-Python
implementation (same tie-breaks), the same contract as BPE/k-core.

Scale shape — identical to BPE's "the corpus never moves again":
- ONE corpus-sized aggregation (word_counts) collapses 100 TB of text
  to the distinct-word table;
- seed vocabulary: one explode of per-word substrings over that table,
  partial-aggregated, TakeOrdered to the seed size;
- per round: ONE Arrow-batched mapInPandas over the distinct-word
  table (the current vocab rides the closure — driver-held model
  state, k-means-style), emitting per-partition PARTIAL piece counts,
  then one small groupBy(piece) + driver M-step (probs, prune);
- single-character pieces are never pruned (full coverage invariant —
  every word stays segmentable)."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.bpe import word_counts


def viterbi_segment(word: str, logp: dict, max_len: int) -> list[str]:
    """Best segmentation under the current model. Deterministic
    tie-break: scanning split points j ASCENDING, a later candidate
    replaces the incumbent only if STRICTLY better — so on exact score
    ties the segmentation with the longest first piece wins. The
    pure-Python reference in tests/test_unigram_lm.py mirrors this loop
    verbatim."""
    n = len(word)
    best = [float("-inf")] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None or best[j] == float("-inf"):
                continue
            score = best[j] + lp
            if score > best[i]:
                best[i] = score
                back[i] = j
    pieces = []
    i = n
    while i > 0:
        j = back[i]
        pieces.append(word[j:i])
        i = j
    return pieces[::-1]


def _count_pieces(words, logp: dict, max_len: int):
    """mapInPandas stage: Viterbi-segment each (word, wcount) batch and
    yield PARTIAL (piece, count) rows — map-side combine in Python."""
    import pandas as pd

    def run(batches):
        acc: dict = {}
        for pdf in batches:
            for w, c in zip(pdf["word"], pdf["wcount"]):
                for piece in viterbi_segment(w, logp, max_len):
                    acc[piece] = acc.get(piece, 0) + int(c)
        if acc:
            items = sorted(acc.items())
            yield pd.DataFrame(
                {"piece": [k for k, _ in items], "cnt": [v for _, v in items]}
            )

    return words.mapInPandas(run, schema="piece string, cnt long")


def unigram_lm_train(
    docs: DataFrame,
    seed_size: int = 2000,
    vocab_size: int = 512,
    n_iters: int = 3,
    max_piece_len: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Train and return the final vocabulary: (token, n, logprob),
    ordered count desc then token.

    Driver-held model state: the piece->logprob dict (vocab_size
    entries, kilobytes). Each round costs one Spark job over the
    distinct-word table."""
    spark = docs.sparkSession
    wc = word_counts(docs, text_col).persist()
    try:
        # seed: substring counts over distinct words, weighted by wcount
        subs = F.expr(
            f"""flatten(transform(sequence(1, length(word)), i ->
                transform(sequence(i, least(length(word), i + {max_piece_len - 1})),
                          j -> substring(word, i, j - i + 1))))"""
        )
        seed = (
            wc.select(F.explode(subs).alias("piece"), F.col("wcount"))
            .groupBy("piece")
            .agg(F.sum("wcount").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("piece"))
            .limit(seed_size)
            .collect()
        )
        counts = {r.piece: int(r.cnt) for r in seed}
        # coverage: every single char always present
        chars = (
            wc.select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, length(word)),"
                        " i -> substring(word, i, 1))"
                    )
                ).alias("piece"),
                F.col("wcount"),
            )
            .groupBy("piece")
            .agg(F.sum("wcount").alias("cnt"))
            .collect()
        )
        for r in chars:
            counts.setdefault(r.piece, int(r.cnt))
        char_set = {r.piece for r in chars}

        def to_logp(c: dict) -> dict:
            total = sum(c.values())
            if total == 0:  # empty corpus: an empty model, not a crash
                return {}
            return {k: math.log(v / total) for k, v in c.items()}

        logp = to_logp(counts)
        for it in range(n_iters):
            got = _count_pieces(wc, logp, max_piece_len).groupBy("piece").agg(
                F.sum("cnt").alias("cnt")
            ).collect()
            counts = {r.piece: int(r.cnt) for r in got}
            for ch in char_set:  # coverage floor
                counts.setdefault(ch, 1)
            if len(counts) > vocab_size:
                multi = sorted(
                    ((k, v) for k, v in counts.items() if k not in char_set),
                    key=lambda kv: (-kv[1], kv[0]),
                )
                keep = dict(multi[: max(0, vocab_size - len(char_set))])
                keep.update({ch: counts[ch] for ch in char_set})
                counts = keep
            logp = to_logp(counts)
        rows = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out = spark.createDataFrame(
            [(k, v, logp[k]) for k, v in rows],
            "token string, n bigint, logprob double",
        )
        return out
    finally:
        wc.unpersist()
