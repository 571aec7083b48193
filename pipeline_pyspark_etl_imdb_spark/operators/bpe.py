"""Distributed BPE vocabulary learning — the fourth iterative shape.

Connected components iterates a MIN label, PageRank a weighted mass,
k-means float centroids; BPE iterates a DISCRETE MODEL (the merge
list). Each round: count adjacent symbol pairs over the corpus, merge
the most frequent pair everywhere, repeat (Sennrich et al. 2016, the
tokenizer-training step of every LLM data pipeline).

Scale shape — the trick that makes BPE distributable is that after ONE
word-count aggregation the corpus never moves again:

- ``word_counts``: one groupBy over the tokenized corpus. 100 TB of
  text collapses to the distinct-word table (10^7-10^8 rows), weighted
  by frequency. Every later round runs on THIS table.
- per round: adjacent-pair counts are one partial-aggregated groupBy
  over the (distinct-word x positions) explode; the winning pair
  (count desc, then lexicographic — deterministic) is TakeOrdered(1),
  k bytes of driver-held model state per round, same class as the
  k-means centroid matrix.
- merge application is a map-only expression fold (F.aggregate over
  the symbol array — greedy left-to-right, standard BPE apply order);
  each round's segmentation is persisted so the physical plan reads
  the previous round's cache, not an n-round lineage chain.

Everything is integer arithmetic on md5-free exact counts, so results
are bit-deterministic; the registry exposure is rows-only only because
the iterative argmax loop is not expressible in one ANSI-SQL oracle
query — tests/test_bpe.py pins merges and token counts against an
independent pure-Python reference instead.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.util import eager_checkpoint, fan_out


def word_counts(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, wcount) — the corpus compressed to its distinct-word
    frequency table. The ONLY corpus-sized aggregation in BPE training;
    map-side combine collapses each partition to its local vocabulary
    before the shuffle."""
    return (
        fan_out(docs)
        .select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("wcount"))
    )


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of every adjacent (left, right) pair in
    a symbol array — one expression fold, no Python. Overlaps resolve
    leftmost-first ('aaa' + merge(a,a) -> [aa, a]), the standard BPE
    apply order the test reference mirrors. The symbols are passed as
    typed literals (F.lit), never interpolated into SQL text, so any
    character is safe."""
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(left + right)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


@dataclass(frozen=True)
class BpeModel:
    """Driver-held model state: ordered merges + the final word
    segmentation frame (distinct-word-sized, persisted)."""

    merges: list[tuple[str, str, int]]  # (left, right, pair_count)
    segmented: DataFrame  # (word, wcount, syms array<string>)


def bpe_learn(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    local_vocab_max: int = 1_000_000,
) -> BpeModel:
    """Learn ``n_merges`` BPE merges over the corpus.

    Ties on pair count break lexicographically (left asc, right asc) so
    the learned vocabulary is bit-deterministic on any engine. Stops
    early if no adjacent pair remains (fully merged corpus).

    Two regimes under one size guard, split at ``local_vocab_max``
    distinct words (the cluster pays ONE corpus-sized aggregation —
    ``word_counts`` — either way; the regimes differ only in where the
    vocabulary-sized rounds run):

    - **local** (vocab fits the driver): collect the distinct-word
      frequency table and run the merge rounds as plain dict/Counter
      arithmetic, then parallelize the final segmentation back. This is
      how production tokenizer training actually splits the work — the
      corpus-sized count is distributed, the model fit is local — and it
      removes 2·n_merges driver/cluster round trips. The collected state
      is the same vocab-sized model state the distributed path already
      holds per round (each round collects the argmax and folds merges
      into every cached row); ~60 B/word means the default guard admits
      ~60 MB, far under driver budgets.
    - **distributed** (past the guard): the per-round pair-count
      groupBy + merge fold below, unchanged — the only correct shape
      once the vocabulary itself outgrows one machine.

    Both regimes implement the identical contract (weighted pair counts,
    count-desc/lex-asc tie break, greedy leftmost-first apply) and are
    pinned against each other and a pure-Python reference in
    tests/test_bpe.py."""
    wc = word_counts(docs, text_col).persist()
    n_words = wc.count()
    if n_words <= local_vocab_max:
        from collections import Counter

        spark: SparkSession = docs.sparkSession
        word_n = {r.word: int(r.wcount) for r in wc.collect()}
        wc.unpersist()
        local_seg = {w: [c for c in w] for w in word_n}
        merges: list[tuple[str, str, int]] = []
        for _ in range(n_merges):
            pair_counts: Counter = Counter()
            for w, syms in local_seg.items():
                wn = word_n[w]
                for a, b in zip(syms, syms[1:]):
                    pair_counts[(a, b)] += wn
            if not pair_counts:
                break
            (left, right), cnt = min(
                pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges.append((left, right, int(cnt)))
            for w, syms in local_seg.items():
                out: list[str] = []
                for x in syms:
                    if out and out[-1] == left and x == right:
                        out[-1] = left + right
                    else:
                        out.append(x)
                local_seg[w] = out
        segmented = spark.createDataFrame(
            [(w, word_n[w], local_seg[w]) for w in sorted(word_n)],
            "word string, wcount bigint, syms array<string>",
        ).persist()
        return BpeModel(merges=merges, segmented=segmented)

    seg = wc.select(
        "word",
        "wcount",
        F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))").alias(
            "syms"
        ),
    )
    seg = seg.persist()
    merges: list[tuple[str, str, int]] = []
    # ONE job per round instead of two: the round's TakeOrdered(1) action
    # both returns the winning pair AND materializes the current
    # segmentation's cache as a side effect, so the previous round's cache
    # can be released immediately after (its blocks were only needed to
    # build this one). The old shape ran an extra count() per round purely
    # to materialize — pure scheduling overhead at every scale, and HALF
    # the per-round jobs on a small vocabulary.
    prev: DataFrame | None = None
    try:
        for _ in range(n_merges):
            pair_struct = F.expr(
                "transform(sequence(1, size(syms) - 1),"
                " i -> struct(syms[i - 1] AS l, syms[i] AS r))"
            )
            top = (
                seg.where(F.size("syms") >= 2)
                .select("wcount", F.explode(pair_struct).alias("p"))
                .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
                .agg(F.sum("wcount").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()
            )
            if prev is not None:
                prev.unpersist()
                prev = None
            if not top:
                break
            left, right, cnt = top[0].l, top[0].r, int(top[0].cnt)
            merges.append((left, right, cnt))
            nxt = seg.select(
                "word", "wcount", _apply_merge(F.col("syms"), left, right).alias("syms")
            ).persist()
            prev, seg = seg, nxt
        if prev is not None:
            # the final segmentation was never the subject of a top-pair
            # action: materialize it before releasing its parent
            seg.count()
            prev.unpersist()
        wc.unpersist()
    except Exception:
        if prev is not None:
            prev.unpersist()
        seg.unpersist()
        wc.unpersist()
        raise
    return BpeModel(merges=merges, segmented=seg)


def bpe_merge_table(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    local_vocab_max: int = 1_000_000,
) -> DataFrame:
    """(merge_rank, left, right, merged, pair_count) — the learned
    vocabulary as a frame, ordered by learning step."""
    spark: SparkSession = docs.sparkSession
    model = bpe_learn(docs, n_merges, text_col, local_vocab_max)
    model.segmented.unpersist()
    rows = [
        (i, l, r, l + r, c) for i, (l, r, c) in enumerate(model.merges)
    ]
    return spark.createDataFrame(
        rows, "merge_rank int, left string, right string, merged string, pair_count bigint"
    ).orderBy("merge_rank")


def bpe_token_counts(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    local_vocab_max: int = 1_000_000,
) -> DataFrame:
    """(token, n_total) — corpus token frequencies AFTER applying the
    learned merges: explode the final distinct-word segmentation weighted
    by word count. One small groupBy over the segmented word table; the
    corpus itself is never re-read."""
    model = bpe_learn(docs, n_merges, text_col, local_vocab_max)
    out = (
        model.segmented.select("wcount", F.explode("syms").alias("token"))
        .groupBy("token")
        .agg(F.sum("wcount").alias("n_total"))
        .orderBy(F.desc("n_total"), F.asc("token"))
    )
    # materialize before releasing the segmentation cache the plan reads
    # checkpoint backs the returned frame; freed at the harness's next
    # release_tracked() (RDD-level blocks leak per call otherwise)
    out = eager_checkpoint(out)
    model.segmented.unpersist()
    return out


def bpe_encode_docs(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_max_words: int = 10_000_000,
    local_vocab_max: int = 1_000_000,
) -> DataFrame:
    """Apply the learned BPE to every document: (doc_id, n_words,
    n_tokens, n_chars, chars_per_token) — the tokenizer-application pass
    that turns a trained vocabulary into per-document token budgets
    (sequence-packing and mixture planning consume exactly this).

    The scale trick mirrors training: merges are NEVER re-folded per
    document. bpe_learn already holds the final segmentation of every
    DISTINCT word, so encoding is a join of the corpus word stream
    against that word->n_tokens table — broadcast under the size guard
    (a subword vocabulary's distinct-word table is small by
    construction), shuffle equi-join past it — followed by ONE
    partial-aggregated groupBy(doc_id). The corpus text is read once."""
    model = bpe_learn(docs, n_merges, text_col, local_vocab_max)
    seg_sizes = model.segmented.select(
        "word", F.size("syms").alias("__wtok"), F.length("word").alias("__wchars")
    )
    small = seg_sizes.count() <= broadcast_max_words
    if small:
        seg_sizes = F.broadcast(seg_sizes)
    words = (
        docs.select(id_col, F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .where(F.col("word") != "")
    )
    out = (
        words.join(seg_sizes, "word")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("__wtok").alias("n_tokens"),
            F.sum("__wchars").alias("n_chars"),
        )
        .select(
            id_col,
            "n_words",
            "n_tokens",
            "n_chars",
            (F.col("n_chars").cast("double") / F.col("n_tokens")).alias(
                "chars_per_token"
            ),
        )
    )
    # checkpoint backs the returned frame; freed at the harness's next
    # release_tracked() (RDD-level blocks leak per call otherwise)
    out = eager_checkpoint(out)
    model.segmented.unpersist()
    return out


def bpe_source_fertility(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    group_col: str = "source",
    broadcast_max_words: int = 10_000_000,
    local_vocab_max: int = 1_000_000,
) -> DataFrame:
    """Tokenizer FERTILITY by corpus slice: (group, n_docs, n_words,
    n_tokens, n_chars, tokens_per_word, chars_per_token) — the standard
    multilingual tokenizer-quality report (fertility = subword tokens
    emitted per word; a tokenizer trained on one language's corpus
    over-fragments the others, and this is the table that shows it
    before a mixing plan locks in token budgets).

    Same scale shape as :func:`bpe_encode_docs`: the trained distinct-
    word segmentation joins the corpus word stream (broadcast under the
    guard), then ONE partial-aggregated groupBy on the slice column —
    tokens_per_word and chars_per_token are correctly-rounded divisions
    of exact BIGINT sums, so the whole report hash-matches an ANSI
    oracle (the _bpe_rounds_sql unrolled-merge chain)."""
    model = bpe_learn(docs, n_merges, text_col, local_vocab_max)
    seg_sizes = model.segmented.select(
        "word", F.size("syms").alias("__wtok"), F.length("word").alias("__wchars")
    )
    if seg_sizes.count() <= broadcast_max_words:
        seg_sizes = F.broadcast(seg_sizes)
    words = docs.select(
        F.col(group_col).alias("grp"),
        F.col("doc_id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("word"),
    ).where(F.col("word") != "")
    out = (
        words.join(seg_sizes, "word")
        .groupBy("grp")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_words"),
            F.sum("__wtok").alias("n_tokens"),
            F.sum("__wchars").alias("n_chars"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            "n_words",
            "n_tokens",
            "n_chars",
            (F.col("n_tokens").cast("double") / F.col("n_words")).alias(
                "tokens_per_word"
            ),
            (F.col("n_chars").cast("double") / F.col("n_tokens")).alias(
                "chars_per_token"
            ),
        )
        .orderBy(group_col)
    )
    # checkpoint backs the returned frame; freed at the harness's next
    # release_tracked() (RDD-level blocks leak per call otherwise)
    out = eager_checkpoint(out)
    model.segmented.unpersist()
    return out
