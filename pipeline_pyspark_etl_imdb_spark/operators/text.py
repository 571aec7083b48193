"""Text-analysis operators over a documents table.

Extensions beyond the reference surface (BASELINE.json north star): token
counting, text statistics, quality scoring, language ID, and document
fingerprinting — the per-document scoring passes an LLM training-data
pipeline runs before filtering/dedup.

Everything is built-in Spark SQL expressions (codegen'd, zero Python in
the hot path) and deterministic across engines:

- tokenization is a regex split on whitespace;
- all arithmetic is integer counts and double division (exact / IEEE-
  deterministic — no transcendental functions whose libm rounding could
  differ between JVM and C);
- hashing uses md5 (bit-identical everywhere), never engine-native hash().

At 100 TB each operator is a single narrow projection + optional
aggregation — no shuffle at all for the per-doc scores (map-only), so
they pipeline into the parquet scan.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"
# subword-ish lexer: letter runs, digit runs, single punctuation marks
BPE_ISH_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

# tiny per-language stopword lists for the n-gram/stopword-voting heuristic
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "los", "un"),
    "fr": ("le", "la", "les", "et", "un", "une", "des"),
    "de": ("der", "die", "das", "und", "ein", "nicht", "ist"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3"),
}


def tokens(text_col: Column | str) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(c, TOKEN_SPLIT_RE)


def word_shingles(tokens_col: str, k: int) -> Column:
    """Distinct k-word shingles of a token-array column (expression form).

    Guarded for short docs: fewer than k tokens yields the whole doc as
    one shingle.
    """
    return F.expr(
        f"CASE WHEN size({tokens_col}) >= {k} THEN "
        f"array_distinct(transform(sequence(0, size({tokens_col}) - {k}), "
        f"i -> concat_ws(' ', slice({tokens_col}, i + 1, {k})))) "
        f"ELSE array(concat_ws(' ', {tokens_col})) END"
    )


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document statistics: chars, tokens, distinct tokens, mean token
    length. Map-only — no shuffle."""
    with_tok = docs.select(id_col, F.col(text_col).alias("__t")).withColumn(
        "__tok", tokens("__t")
    )
    return with_tok.select(
        id_col,
        F.length("__t").cast("bigint").alias("n_chars"),
        F.size("__tok").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("__tok")).cast("bigint").alias("n_distinct_tokens"),
        (
            F.aggregate("__tok", F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x))
            .cast("double")
            / F.size("__tok")
        ).alias("avg_token_len"),
    )


def subtoken_count(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """BPE-ish subtoken count via a regex lexer (letter runs / digit runs /
    single punctuation)."""
    return docs.select(
        id_col,
        F.size(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_ISH_RE), 0))
        .cast("bigint")
        .alias("n_subtokens"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Composite quality score in [0,1] from length, stopword ratio and
    punctuation ratio. Pure rational arithmetic — reproducible bit-for-bit
    on any engine. Scoring is case-insensitive: the text lowercases before
    tokenizing so capitals neither miss the stoplist nor count as
    punctuation under the [^a-z0-9\\s] class."""
    en_stop = F.array([F.lit(w) for w in LANG_STOPWORDS["en"]])
    with_tok = docs.select(id_col, F.lower(F.col(text_col)).alias("__t")).withColumn(
        "__tok", tokens("__t")
    )
    n_tokens = F.size("__tok")
    n_stop = F.size(F.filter("__tok", lambda t: F.array_contains(en_stop, t)))
    n_punct = F.length("__t") - F.length(F.regexp_replace("__t", "[^a-z0-9\\s]", ""))
    stop_ratio = n_stop.cast("double") / n_tokens
    punct_ratio = n_punct.cast("double") / F.length("__t")
    length_term = F.least(n_tokens.cast("double") / 100.0, F.lit(1.0))
    return with_tok.select(
        id_col,
        n_tokens.cast("bigint").alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
        punct_ratio.alias("punct_ratio"),
        (0.5 * length_term + 0.3 * stop_ratio + 0.2 * (1.0 - punct_ratio)).alias("quality"),
    )


def gopher_quality_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 20,
    max_words: int = 100_000,
) -> DataFrame:
    """Gopher-style rule battery (Rae et al. 2021 §A1.1, public paper):
    per-document boolean flags plus the conjunctive keep decision —
    word-count bounds, mean word length in [3,10], >=80% of words
    containing an alphabetic character, >=2 stopwords. All flags are
    integer/rational comparisons on token arrays — map-only builtin
    expressions fused into the scan, reproducible on any engine."""
    en_stop = F.array([F.lit(w) for w in LANG_STOPWORDS["en"]])
    with_tok = docs.select(id_col, F.lower(F.col(text_col)).alias("__t")).withColumn(
        "__tok", tokens("__t")
    )
    n_words = F.size("__tok")
    sum_len = F.aggregate(
        F.transform("__tok", lambda t: F.length(t).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    mean_len = sum_len.cast("double") / n_words
    n_alpha = F.size(F.filter("__tok", lambda t: t.rlike("[a-z]")))
    n_stop = F.size(F.filter("__tok", lambda t: F.array_contains(en_stop, t)))
    flag_word_count = (n_words >= min_words) & (n_words <= max_words)
    flag_mean_len = (mean_len >= 3.0) & (mean_len <= 10.0)
    flag_alpha = n_alpha.cast("double") / n_words >= 0.8
    flag_stop = n_stop >= 2
    return with_tok.select(
        id_col,
        n_words.cast("bigint").alias("n_words"),
        mean_len.alias("mean_word_len"),
        flag_word_count.alias("flag_word_count"),
        flag_mean_len.alias("flag_mean_len"),
        flag_alpha.alias("flag_alpha"),
        flag_stop.alias("flag_stop"),
        (flag_word_count & flag_mean_len & flag_alpha & flag_stop).alias("keep"),
    )


def quality_expr(text_col: Column) -> Column:
    """``quality_score``'s composite score as a single column expression —
    for pipelines that filter on quality inline (corpus_build) without
    joining a score frame back against the documents. Must stay formula-
    identical to quality_score above (the corpus_build oracle pins it)."""
    t = F.lower(text_col)
    tok = tokens(t)
    en_stop = F.array([F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_tokens = F.size(tok)
    n_stop = F.size(F.filter(tok, lambda x: F.array_contains(en_stop, x)))
    n_punct = F.length(t) - F.length(F.regexp_replace(t, "[^a-z0-9\\s]", ""))
    stop_ratio = n_stop.cast("double") / n_tokens
    punct_ratio = n_punct.cast("double") / F.length(t)
    length_term = F.least(n_tokens.cast("double") / 100.0, F.lit(1.0))
    return 0.5 * length_term + 0.3 * stop_ratio + 0.2 * (1.0 - punct_ratio)


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-voting language ID: count distinct-token hits against each
    language's stopword list, predict the argmax (ties and zero hits ->
    'und'). Case-insensitive (text lowercases first — sentence-initial
    'The' must hit the stoplist). Deterministic tie-break: languages
    compared in sorted order."""
    with_tok = docs.select(id_col, F.lower(F.col(text_col)).alias("__t")).withColumn(
        "__tok", F.array_distinct(tokens("__t"))
    )
    hit_cols = {
        lang: F.size(
            F.array_intersect("__tok", F.array([F.lit(w) for w in words]))
        )
        for lang, words in sorted(LANG_STOPWORDS.items())
    }
    scored = with_tok.select(
        id_col, *[c.alias(f"__hits_{lang}") for lang, c in hit_cols.items()]
    )
    best = F.greatest(*[F.col(f"__hits_{lang}") for lang in hit_cols])
    # first language (sorted order) achieving the max, strictly above all others -> that lang
    pred = F.lit("und")
    for lang in sorted(hit_cols, reverse=True):
        others_max = F.greatest(
            *[F.col(f"__hits_{o}") for o in hit_cols if o != lang], F.lit(0)
        )
        pred = F.when(
            (F.col(f"__hits_{lang}") == best)
            & (best > 0)
            & (F.col(f"__hits_{lang}") > others_max),
            F.lit(lang),
        ).otherwise(pred)
    return scored.select(id_col, pred.alias("pred_lang"))


def doc_fingerprint(
    docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Content fingerprint: the lexicographic minimum of md5 over the
    document's k-word shingles (a 1-permutation MinHash). Documents with
    equal fingerprints share at least one shingle — a cheap first-pass
    cluster key for dedup. Map-only."""
    with_sh = (
        docs.select(id_col, F.col(text_col).alias("__t"))
        .withColumn("__tok", tokens("__t"))
        .withColumn("__sh", word_shingles("__tok", k))
    )
    return with_sh.select(
        id_col,
        F.array_min(F.transform("__sh", lambda s: F.md5(s))).alias("fingerprint"),
    )


def bigram_list(tokens_col: str) -> Column:
    """ALL adjacent word bigrams of a token-array column (duplicates kept —
    repetition measurement needs the multiset, unlike word_shingles)."""
    return F.expr(
        f"CASE WHEN size({tokens_col}) >= 2 THEN "
        f"transform(sequence(0, size({tokens_col}) - 2), "
        f"i -> concat(element_at({tokens_col}, i + 1), ' ', "
        f"element_at({tokens_col}, i + 2))) "
        f"ELSE array() END"
    )


def repetition_score(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signal: the fraction of adjacent word
    bigrams that are duplicates of an earlier bigram in the same document
    (1 - distinct/total). High values flag boilerplate/spam for quality
    filtering. Map-only, exact rational arithmetic."""
    with_bg = (
        docs.select(id_col, F.col(text_col).alias("__t"))
        .withColumn("__tok", tokens("__t"))
        .withColumn("__bg", bigram_list("__tok"))
    )
    n_bg = F.size("__bg").cast("bigint")
    n_distinct = F.size(F.array_distinct("__bg")).cast("bigint")
    return with_bg.select(
        id_col,
        n_bg.alias("n_bigrams"),
        n_distinct.alias("n_distinct_bigrams"),
        F.when(n_bg > 0, 1.0 - n_distinct.cast("double") / n_bg)
        .otherwise(F.lit(0.0))
        .alias("dup_bigram_ratio"),
    )


# PII patterns restricted to syntax with identical semantics in Java
# regex and RE2 (no backrefs, no lookaround), so Spark and any oracle
# engine find the same matches
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\+?[0-9][0-9()\\-\\s]{6,}[0-9]"


def pii_redact(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII scrub: replace email addresses then phone-number-shaped digit
    runs with typed placeholder tokens; emit match counts and the md5 of
    the redacted text (the bytes a downstream stage would train on).
    Map-only — the 100 TB shape is a projection fused into the scan."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)).cast("bigint")
    clean = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    n_phones = F.size(F.regexp_extract_all(clean, F.lit(PHONE_RE), 0)).cast("bigint")
    clean = F.regexp_replace(clean, PHONE_RE, "<PHONE>")
    return docs.select(
        id_col,
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        F.md5(clean).alias("clean_md5"),
    )


def ngram_stats(
    docs: DataFrame,
    top: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide bigram frequency: the exact heavy-hitters baseline
    (occurrences + document frequency per bigram, top-``top`` by count).
    One shuffle on the bigram key with map-side partial aggregation; the
    global top-``top`` moves only ``top`` rows per partition after the
    agg. Ties break lexicographically so the cut is deterministic."""
    exploded = (
        docs.select(id_col, F.col(text_col).alias("__t"))
        .withColumn("__tok", tokens("__t"))
        .select(id_col, F.explode(bigram_list("__tok")).alias("ngram"))
    )
    return (
        exploded.groupBy("ngram")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.count_distinct(F.col(id_col)).alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
        .limit(top)
    )


def tfidf_top_terms(
    docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-``k`` characteristic terms per document. Ranking is exact
    integer comparison — term frequency DESC, document frequency ASC, term
    ASC — so the selected set is engine-independent; the reported tf-idf
    score (tf * ln(N/df)) is informational and only subject to libm ulp
    noise, far inside the 1e-6 comparison rounding.

    Shape: explode -> (doc, term) count -> term df (one agg each, partial
    map-side) -> per-doc top-k via a partitioned rank window
    (WindowGroupLimit pushes the cut before the final sort at scale)."""
    terms = (
        docs.select(id_col, F.lower(F.col(text_col)).alias("__t"))
        .select(id_col, F.explode(tokens("__t")).alias("term"))
        .where(F.col("term") != "")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.count("*").cast("double").alias("__n"))
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    return (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            id_col,
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            (F.col("tf") * F.log(F.col("__n") / F.col("df"))).alias("tfidf"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


def feature_hash_tokens(
    docs: DataFrame,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashing-trick featurization: sparse (doc_id, bucket, n) token
    counts with bucket = md5(token) mod ``n_buckets`` — the fixed-width,
    vocabulary-free document representation (classifier features, cheap
    embeddings) that needs no vocabulary broadcast and no training pass.

    Deterministic across engines (md5-derived bucket, never engine-native
    hash()). One partially-aggregated groupBy on (doc, bucket) — at 100 TB
    the explode never materializes: Catalyst fuses explode -> project ->
    partial-agg into the scan stage, and the shuffle moves at most
    n_buckets rows per document."""
    from pipeline_pyspark_etl_imdb_spark.operators.corpus import hex_uniform

    tok = docs.select(
        id_col, F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    ).withColumn("__h", F.md5("token"))
    return (
        tok.groupBy(id_col, (hex_uniform("__h") % n_buckets).cast("int").alias("bucket"))
        .agg(F.count("*").alias("n"))
    )


def vocab_build(
    docs: DataFrame, size: int = 1000, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-``size`` token vocabulary with dense ids: (token, n, token_id),
    ranked by (count desc, token asc) — the tokenizer-training primitive.

    Scale shape: one partially-aggregated groupBy for counts, then
    orderBy().limit(size) — Spark plans that as TakeOrderedAndProject
    (per-partition top-size, merged at the driver), NOT a global sort.
    The final row_number window is single-partition BY DESIGN: it runs
    over at most ``size`` rows (the already-cut vocabulary), bounded
    regardless of corpus scale."""
    counts = (
        docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    top = counts.orderBy(F.col("n").desc(), F.col("token")).limit(size)
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    return top.withColumn("token_id", (F.row_number().over(w) - 1).cast("int"))


def bigram_logprob(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document average negative log-likelihood under the corpus's
    own BIGRAM model — the next step up from unigram_logprob's perplexity
    proxy (catches locally-incoherent text that unigram frequencies
    miss). p(w2|w1) = c(w1 w2) / c(w1 ·), both counts from the corpus
    itself, so every scored bigram is in the model (no OOV smoothing).

    Scale shape: unlike the unigram model (vocabulary-sized, broadcast),
    the bigram table grows with observed pairs, so the score join is a
    plain co-partitioned equi-join ON THE BIGRAM KEY (one shuffle each
    side, no broadcast assumption); the prefix totals c(w1 ·) are folded
    into the model frame before that join, not joined per occurrence."""
    grams = docs.select(
        id_col, F.lower(F.col(text_col)).alias("__t")
    ).withColumn("__tok", tokens("__t")).select(
        id_col, F.explode(bigram_list("__tok")).alias("bigram")
    )
    pair_c = grams.groupBy("bigram").agg(F.count("*").alias("c12"))
    model = pair_c.withColumn(
        "w1", F.substring_index("bigram", " ", 1)
    )
    prefix_c = model.groupBy("w1").agg(F.sum("c12").alias("c1"))
    model = model.join(prefix_c, "w1").select("bigram", "c12", "c1")
    scored = grams.join(model, "bigram").withColumn(
        "neg_ln_p", -F.log(F.col("c12").cast("double") / F.col("c1"))
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.avg("neg_ln_p").alias("avg_neg_logprob"),
    )


def unigram_logprob(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document average negative log-likelihood under the corpus's own
    unigram model — the cheap perplexity proxy used for quality filtering
    (docs of rare/garbled tokens score high, templated boilerplate scores
    low). p(tok) = corpus_count / corpus_total; no OOV smoothing needed
    because every scored token is, by construction, in the model.

    Two aggregations over one exploded token stream: corpus frequencies
    (vocabulary-sized result — broadcast back against the token stream),
    then a per-doc mean. The token stream never materializes twice: Spark
    rebuilds it from the (cheap) scan on each side rather than shuffling
    the full stream to disk."""
    tok = docs.select(
        id_col, F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    )
    freq = tok.groupBy("token").agg(F.count("*").alias("n_tok"))
    total = tok.agg(F.count("*").alias("n_total"))
    model = freq.crossJoin(F.broadcast(total))
    scored = tok.join(
        F.broadcast(model), "token"
    ).withColumn("neg_ln_p", -F.log(F.col("n_tok") / F.col("n_total")))
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg("neg_ln_p").alias("avg_neg_logprob"),
        )
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str | list[str] = "doc_id",
) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed query-term
    set (Robertson et al., TREC-3; the Lucene +1 idf variant so idf stays
    positive even for terms in more than half the corpus):

        score(d) = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
        idf(t)   = ln((N - df + 0.5)/(df + 0.5) + 1)

    Output: (*id_cols, n_matched, score) for units matching at least
    one query term, ordered score DESC, ids ASC. ``id_col`` may be a
    list for composite retrieval units (e.g. (doc_id, chunk_idx) for
    passage-level scoring — see rag_chunk_bm25).

    Scale shape: the token stream is filtered to the query terms BEFORE
    any aggregation, so tf/df tables are bounded by |Q| * n_docs and |Q|
    — never vocabulary-sized. Document lengths come from one partial
    aggregation over the unfiltered stream (the same single-pass shape as
    unigram_logprob); N, avgdl, and the per-term idf table are scalar/
    |Q|-sized and broadcast. Everything downstream of the explode is
    built-in expressions — no Python in the hot path."""
    ids = [id_col] if isinstance(id_col, str) else list(id_col)
    qlit = F.array(*[F.lit(t) for t in query_terms])
    tok = docs.select(
        *ids, F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    ).where(F.col("term") != "")
    doclen = tok.groupBy(*ids).agg(F.count("*").alias("dl"))
    stats = doclen.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    qtok = tok.where(F.array_contains(qlit, F.col("term")))
    tf = qtok.groupBy(*ids, "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = df_.crossJoin(F.broadcast(stats)).select(
        "term",
        F.log(
            (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        ).alias("idf"),
        "avgdl",
    )
    norm = F.col("tf") * F.lit(k1 + 1.0) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(idf), "term")
        .join(doclen, ids)
        .groupBy(*ids)
        .agg(
            F.count("*").cast("bigint").alias("n_matched"),
            F.sum(F.col("idf") * norm).alias("score"),
        )
        .orderBy(F.desc("score"), *[F.asc(c) for c in ids])
    )


def rag_chunk_bm25(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    max_tokens: int = 64,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Passage-level retrieval, the RAG indexing shape: split documents
    into overlapping token windows (corpus.chunk_documents) and BM25-score
    every chunk against the query-term set; return the global top-``k``
    chunks. df/N/avgdl are computed at CHUNK granularity — the standard
    passage-retrieval statistics.

    The top-k cut orders by the score ROUNDED to 6 decimals (the oracle
    comparison resolution) with (doc_id, chunk_idx) tie-break, so the kept
    set is engine-portable even when two chunks tie.

    Scale shape: chunking is map-only (explode, no shuffle); scoring
    inherits bm25_scores' bounded tf/df tables; the final cut is a global
    TakeOrderedAndProject — k rows to the driver, never a full sort."""
    from pipeline_pyspark_etl_imdb_spark.operators.corpus import chunk_documents

    chunks = chunk_documents(
        docs, max_tokens=max_tokens, overlap=overlap, text_col=text_col, id_col=id_col
    )
    scored = bm25_scores(
        chunks,
        query_terms,
        text_col="chunk_text",
        id_col=[id_col, "chunk_idx"],
    )
    return (
        scored.orderBy(
            F.desc(F.round("score", 6)), F.asc(id_col), F.asc("chunk_idx")
        )
        .limit(k)
        .select(id_col, "chunk_idx", "n_matched", "score")
    )


def vocab_zipf_fit(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One-row Zipf's-law fit over the corpus vocabulary: OLS of
    ln(count) on ln(rank) (rank 1 = most frequent; ties broken by token
    so the rank order is engine-exact). A healthy natural-language corpus
    fits slope ≈ -1; a synthetic or template-heavy corpus departs — the
    cheap distribution-drift alarm for an ingest pipeline. Output:
    (n_types, n_tokens, slope, intercept, r2).

    Composition of existing shapes: one vocabulary groupBy (map-side
    combine, vocabulary-sized result), the DISTRIBUTED rank
    (ranks.total_order_ranks — no single-partition window), and the
    closed-form OLS sums in one constant-size aggregate."""
    from pipeline_pyspark_etl_imdb_spark.operators.ranks import total_order_ranks

    vocab = (
        docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    ranked = total_order_ranks(
        vocab.withColumn("__neg", -F.col("cnt")),
        ["__neg", "token"],
        # vocab is a small aggregate of a corpus-sized explode: materialize
        # once so the range-boundary sampling pass cannot re-run the explode
        materialize_input=True,
    ).select(
        F.log(F.col("global_rn").cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
        "cnt",
    )
    agg = ranked.agg(
        F.count("*").cast("bigint").alias("n_types"),
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n_types").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov / varx
    return agg.select(
        "n_types",
        "n_tokens",
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / n).alias("intercept"),
        ((cov * cov) / (varx * vary)).alias("r2"),
    )


def ngram_diversity(
    docs: DataFrame,
    group_col: str = "lang",
    max_n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-health distinct-n: per group (language, source, ...) and
    n in 1..max_n, total vs distinct n-gram counts and their ratio —
    the distinct-n diversity metric (Li et al. 2016) that flags
    template/boilerplate-dominated slices of a corpus before they reach
    training (a low distinct-2 on a domain is the classic symptom of
    scraped duplication that survives doc-level dedup).

    Shape: the tokenizer runs ONCE per document; the n n-gram streams
    are a union of map-only slide windows over the same token array, so
    the only shuffle is the (group, n, ngram) pre-aggregation followed
    by the (group, n) rollup — both partial-aggregated. Exact rational
    output (integer counts, one double division)."""
    base = docs.select(
        F.col(group_col).alias("grp"), tokens(F.col(text_col)).alias("__tok")
    )
    streams = []
    for n in range(1, max_n + 1):
        # guard: sequence(1, 0) would run DESCENDING in Spark, emitting
        # phantom windows for docs shorter than n tokens
        grams = F.expr(
            f"CASE WHEN size(__tok) >= {n} THEN"
            f" transform(sequence(1, size(__tok) - {n - 1}),"
            f" i -> array_join(slice(__tok, i, {n}), ' '))"
            f" ELSE CAST(array() AS array<string>) END"
        )
        streams.append(
            base.select("grp", F.lit(n).alias("n"), F.explode(grams).alias("g"))
        )
    allgrams = streams[0]
    for s in streams[1:]:
        allgrams = allgrams.unionAll(s)
    per_gram = allgrams.groupBy("grp", "n", "g").agg(F.count("*").alias("c"))
    return (
        per_gram.groupBy("grp", "n")
        .agg(
            F.sum("c").alias("total_ngrams"),
            F.count("*").alias("distinct_ngrams"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n",
            "total_ngrams",
            "distinct_ngrams",
            (
                F.col("distinct_ngrams").cast("double") / F.col("total_ngrams")
            ).alias("diversity"),
        )
        .orderBy(group_col, "n")
    )


def lang_confusion(docs: DataFrame, label_col: str = "lang") -> DataFrame:
    """Language-ID confusion matrix: (label_lang, pred_lang, n, recall)
    — the classifier-evaluation view of lang_id against the labeled
    language column, the report that decides whether the heuristic is
    safe to gate a multilingual corpus (off-diagonal mass = docs the
    filter would misroute).

    recall normalizes each row over its label total (row-stochastic).
    One map-only scoring pass (lang_id is pure expressions), ONE
    partial-aggregated groupBy(label, pred) — |langs|^2-bounded output
    — and a broadcast of the |langs|-row label totals."""
    pred = lang_id(docs)
    joined = docs.select("doc_id", F.col(label_col).alias("label_lang")).join(
        pred, "doc_id"
    )
    cm = joined.groupBy("label_lang", "pred_lang").agg(F.count("*").alias("n"))
    totals = cm.groupBy("label_lang").agg(F.sum("n").alias("__tot"))
    return (
        cm.join(F.broadcast(totals), "label_lang")
        .select(
            "label_lang",
            "pred_lang",
            "n",
            (F.col("n").cast("double") / F.col("__tot")).alias("recall"),
        )
        .orderBy("label_lang", "pred_lang")
    )


def lang_id_kappa(docs: DataFrame, label_col: str = "lang") -> DataFrame:
    """Cohen's kappa between lang_id and the labeled language — chance-
    corrected agreement, the one-number companion to lang_confusion
    (accuracy alone flatters any classifier on a skewed label mix).

    kappa = (p_o - p_e) / (1 - p_e), p_e = sum_k row_share * col_share.

    All inputs are integer counts from ONE groupBy over the scored
    corpus; the |langs|^2-bounded marginal sums happen on that tiny
    frame. Fixed-order double arithmetic -> oracle-backed."""
    pred = lang_id(docs)
    joined = docs.select("doc_id", F.col(label_col).alias("lab")).join(pred, "doc_id")
    cm = joined.groupBy("lab", "pred_lang").agg(F.count("*").alias("n"))
    n_total = F.sum("n")
    agree = F.sum(F.when(F.col("lab") == F.col("pred_lang"), F.col("n")).otherwise(0))
    stats = cm.agg(n_total.alias("__n"), agree.alias("__agree"))
    # marginals on the tiny cell frame; integer sums — order-free
    row_tot = cm.groupBy("lab").agg(F.sum("n").alias("rn"))
    col_tot = cm.groupBy("pred_lang").agg(F.sum("n").alias("cn"))
    pe_frame = (
        row_tot.join(
            col_tot, row_tot["lab"] == col_tot["pred_lang"], "inner"
        )
        .agg(F.sum(F.col("rn") * F.col("cn")).alias("__pe_num"))
    )
    base = stats.select("__n", "__agree").crossJoin(F.broadcast(pe_frame))
    po = F.col("__agree").cast("double") / F.col("__n")
    pe = F.col("__pe_num").cast("double") / (F.col("__n") * F.col("__n"))
    return base.select(
        F.col("__n").cast("bigint").alias("n_docs"),
        po.alias("accuracy"),
        pe.alias("expected_agreement"),
        ((po - pe) / (F.lit(1.0) - pe)).alias("kappa"),
    )


def lang_token_entropy(
    docs: DataFrame, lang_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Per-language unigram entropy — the third corpus-health axis next
    to the Zipf slope (vocab_zipf_fit) and distinct-n (ngram_diversity):
    H = ln N - (sum c_w ln c_w) / N over the language's token counts,
    plus the normalized efficiency H / ln(vocab) in [0, 1] (1 = uniform
    usage; a collapse toward 0 flags template/boilerplate flooding long
    before eyeballing samples would).

    Shape: one (lang, token) partial-aggregated count, then one
    lang-granular rollup carrying sum(c ln c) — vocabulary-sized
    intermediate, never corpus-sized; ln only at the scoring expression
    (6-dp comparison absorbs libm ulps, the DSIR/Zipf policy).
    Single-token vocabularies report efficiency NULL (ln 1 = 0 —
    no usage distribution exists to be uneven)."""
    counts = (
        docs.select(
            F.col(lang_col).alias("lang"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
        )
        .where(F.col("tok") != "")
        .groupBy("lang", "tok")
        .agg(F.count("*").alias("c"))
    )
    agg = counts.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("vocab_size"),
        F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))).alias(
            "__clnc"
        ),
    )
    h = F.log(F.col("n_tokens").cast("double")) - F.col("__clnc") / F.col("n_tokens")
    return agg.select(
        "lang",
        "n_tokens",
        "vocab_size",
        h.alias("entropy_nats"),
        F.when(
            F.col("vocab_size") > 1,
            h / F.log(F.col("vocab_size").cast("double")),
        ).alias("entropy_efficiency"),
    ).orderBy("lang")


def token_pmi_pairs(
    docs: DataFrame,
    min_count: int = 5,
    top: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Top adjacent-token collocations by pointwise mutual information:
    (w1, w2, n_pair, pmi) — the classic phrase detector (Church & Hanks
    1990; word2vec's phrase pass uses the same score). High-PMI pairs
    are multi-word units a tokenizer or n-gram LM should treat as one.

        pmi = ln( (c12/B) / ((c1/N) * (c2/N)) )

    with B = total bigrams, N = total tokens, marginals from the token
    stream. min_count prunes the bigram table BEFORE the marginal joins
    (the association-rules discipline: support-prune, then join), so the
    joined frame is collocation-candidate-sized, not corpus-sized; the
    unigram side is vocabulary-sized and co-partitioned on the word key.
    Ranked by the raw probability RATIO (ln is monotone, so same order),
    computed as one integer-derived double division per row —
    cross-engine-identical while c12*N^2 stays under 2^53 (holds through
    ~10^7-token fixtures; past that the ratio is still correct to an ulp
    and only exact-ties at the cut could flip). TakeOrderedAndProject for
    the top cut, never a global sort."""
    toks = docs.select(
        F.lower(F.col(text_col)).alias("__t")
    ).withColumn("__tok", tokens("__t"))
    unigrams = toks.select(F.explode("__tok").alias("w"))
    uni_c = unigrams.groupBy("w").agg(F.count("*").alias("cw"))
    grams = toks.select(F.explode(bigram_list("__tok")).alias("bigram"))
    pair_c = (
        grams.groupBy("bigram")
        .agg(F.count("*").alias("n_pair"))
        .where(F.col("n_pair") >= min_count)
        .withColumn("w1", F.substring_index("bigram", " ", 1))
        .withColumn("w2", F.substring_index("bigram", " ", -1))
    )
    # totals as 1-row broadcast frames (constant-size aggregates)
    tot = unigrams.agg(F.count("*").alias("n_tokens")).crossJoin(
        grams.agg(F.count("*").alias("n_bigrams"))
    )
    joined = (
        pair_c.join(uni_c.select(F.col("w").alias("w1"), F.col("cw").alias("c1")), "w1")
        .join(uni_c.select(F.col("w").alias("w2"), F.col("cw").alias("c2")), "w2")
        .crossJoin(F.broadcast(tot))
    )
    ratio = (
        F.col("n_pair").cast("double")
        * F.col("n_tokens").cast("double")
        * F.col("n_tokens").cast("double")
        / (
            F.col("n_bigrams").cast("double")
            * F.col("c1").cast("double")
            * F.col("c2").cast("double")
        )
    )
    return (
        joined.withColumn("__ratio", ratio)
        .orderBy(F.desc("__ratio"), F.asc("bigram"))
        .limit(top)
        .select(
            "w1",
            "w2",
            "n_pair",
            F.log("__ratio").alias("pmi"),
        )
    )


def gini_token_concentration(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """One-row Gini coefficient of the corpus token-frequency
    distribution: 0 = every type equally frequent, ->1 = a few types
    dominate. The third corpus-concentration axis next to the Zipf slope
    (shape of the rank curve) and token entropy (bits per token) — a
    rising Gini under a fixed tokenizer is the cheap alarm for template
    floods and boilerplate ingest.

    Exactness: with frequencies sorted ascending and ranked 1..V
    (ties broken by token — any stable order among equal frequencies
    yields the same sum), Gini = 2*sum(rank*f) / (V*sum(f)) - (V+1)/V.
    Both rank-weighted sums stay DECIMAL(38,0)-exact (rank*f exceeds
    int64 at corpus scale), convert to double via the VARCHAR route the
    concentration oracles established, and the result is two
    correctly-rounded divisions and one subtraction — engine-exact.

    Scale shape: one vocabulary groupBy (map-side combine) + the
    DISTRIBUTED rank (total_order_ranks — no single-partition window)
    + one constant-size aggregate. Output: (n_types, n_tokens, gini)."""
    from pipeline_pyspark_etl_imdb_spark.operators.ranks import total_order_ranks

    vocab = (
        docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    ranked = total_order_ranks(vocab, ["cnt", "token"], materialize_input=True)
    agg = ranked.agg(
        F.count("*").cast("bigint").alias("n_types"),
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.sum(
            F.col("global_rn").cast("decimal(38,0)")
            * F.col("cnt").cast("decimal(38,0)")
        ).alias("s_rank_wt"),
    )
    v = F.col("n_types")
    num = (F.lit(2).cast("decimal(38,0)") * F.col("s_rank_wt")).cast(
        "string"
    ).cast("double")
    den = (
        v.cast("decimal(38,0)") * F.col("n_tokens").cast("decimal(38,0)")
    ).cast("string").cast("double")
    correction = (v + 1).cast("double") / v.cast("double")
    return agg.select(
        "n_types",
        "n_tokens",
        (num / den - correction).alias("gini"),
    )


def hill_tail_index(
    df: DataFrame, value_col: str, k: int = 100
) -> DataFrame:
    """One-row Hill estimator of the tail index of ``value_col`` — the
    standard heavy-tail diagnostic for document-length and popularity
    distributions (is the megadoc tail power-law, and how fat?):
    hill = mean over the top-k values of ln(x_i / x_(k+1)), alpha =
    1/hill. A corpus whose alpha drifts below ~1 is dominated by its
    largest documents (the whale-curve's parametric cousin).

    Exactness: the top-(k+1) multiset comes from TakeOrderedAndProject
    (no global sort); the ln-ratio sum is a LEFT-TO-RIGHT fold over the
    descending-sorted array in both engines (F.aggregate here,
    list_reduce in the oracle) — float summation order is pinned, so the
    estimate hash-matches. k adapts to small inputs (k_eff =
    min(k, n-1)). Output: (k_eff, x_tail, hill, tail_alpha)."""
    vals = df.select(F.col(value_col).cast("double").alias("x")).where(
        F.col("x") > 0
    )
    top = vals.orderBy(F.desc("x")).limit(k + 1)
    arr = top.agg(F.sort_array(F.collect_list("x"), asc=False).alias("a"))
    # empty input: collect_list yields [], and element_at(a, 0) THROWS in
    # Spark (index 0 invalid) even with ANSI off — guard both derived
    # columns so the empty corpus yields one all-NULL row, matching the
    # oracle's list(x)-over-zero-rows NULL propagation
    k_eff = F.when(F.size("a") >= 1, F.least(F.lit(k), F.size("a") - 1))
    x_tail = F.when(F.size("a") >= 1, F.element_at("a", F.size("a")))
    hill = F.when(
        k_eff >= 1,
        F.aggregate(
            F.slice("a", F.lit(1), k_eff),
            F.lit(0.0),
            lambda acc, x: acc + (F.log(x) - F.log(x_tail)),
        )
        / k_eff,
    )
    return arr.select(
        k_eff.cast("int").alias("k_eff"),
        x_tail.alias("x_tail"),
        hill.alias("hill"),
        F.when(hill > 0, F.lit(1.0) / hill).alias("tail_alpha"),
    )


def readability_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document readability battery: sentence count ([.!?]+ runs),
    word count, a syllable proxy (vowel-group runs — the classic
    dictionary-free approximation), and the two standard composites
    (Flesch reading ease, Flesch-Kincaid grade). Joins the quality-score
    battery as a register-level signal: training corpora skewed to
    extreme grades are boilerplate or OCR garbage.

    Every count is one regexp over the lowered text (identical
    Java-regex/RE2 semantics for these character-class patterns); the
    composites are fixed-order literal arithmetic on two correctly-
    rounded divisions — engine-exact, so the whole frame hash-matches.
    Map-only, no shuffle. Output: (doc_id, n_words, n_sentences,
    n_syllables, flesch_ease, fk_grade)."""
    lt = F.lower(F.col(text_col))
    n_words = F.size(F.filter(F.split(lt, r"\s+"), lambda w: w != ""))
    n_sent = F.regexp_count(F.col(text_col), F.lit(r"[.!?]+"))
    n_syl = F.regexp_count(lt, F.lit(r"[aeiou]+"))
    wps = n_words.cast("double") / F.greatest(n_sent, F.lit(1)).cast("double")
    spw = n_syl.cast("double") / F.greatest(n_words, F.lit(1)).cast("double")
    return docs.select(
        F.col(id_col),
        n_words.cast("bigint").alias("n_words"),
        n_sent.cast("bigint").alias("n_sentences"),
        n_syl.cast("bigint").alias("n_syllables"),
        (F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw).alias(
            "flesch_ease"
        ),
        (F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)).alias("fk_grade"),
    )


def vocab_coverage_curve(
    docs: DataFrame,
    sizes: tuple[int, ...] = (256, 512, 1024, 2048, 4096, 8192),
    text_col: str = "text",
) -> DataFrame:
    """Token-mass coverage of the top-V vocabulary for each candidate V
    — the tokenizer-sizing curve ("how much of the corpus does a 4k
    vocab already cover?") that decides the BPE budget before training
    (`bpe.py`) starts. One row per V: (vocab_size, n_types, n_tokens,
    covered_types, covered_tokens, coverage).

    Shape: one vocabulary groupBy (map-side combine), the DISTRIBUTED
    total-order rank (ranks.total_order_ranks — no single-partition
    window over the vocabulary), then ONE constant-size conditional-sum
    fold emitting all |sizes| rows via explode. Counts stay integers;
    only the coverage share divides as double."""
    from pipeline_pyspark_etl_imdb_spark.operators.ranks import total_order_ranks

    vocab = (
        docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    ranked = total_order_ranks(
        vocab.withColumn("__neg", -F.col("cnt")),
        ["__neg", "token"],
        materialize_input=True,
    )
    aggs = [
        F.count("*").cast("bigint").alias("n_types"),
        F.sum("cnt").cast("bigint").alias("n_tokens"),
    ]
    for v in sizes:
        aggs.append(
            F.sum(F.when(F.col("global_rn") <= v, F.col("cnt")))
            .cast("bigint")
            .alias(f"__c{v}")
        )
    one = ranked.agg(*aggs)
    rows = [
        F.struct(
            F.lit(v).alias("vocab_size"),
            F.least(F.lit(v).cast("bigint"), F.col("n_types")).alias(
                "covered_types"
            ),
            F.coalesce(F.col(f"__c{v}"), F.lit(0)).alias("covered_tokens"),
            (
                F.coalesce(F.col(f"__c{v}"), F.lit(0)).cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("coverage"),
        )
        for v in sizes
    ]
    return (
        one.select("n_types", "n_tokens", F.explode(F.array(*rows)).alias("m"))
        .select("m.vocab_size", "n_types", "n_tokens", "m.covered_types",
                "m.covered_tokens", "m.coverage")
        .orderBy("vocab_size")
    )


def distinctive_tokens_logodds(
    docs: DataFrame,
    in_group: Column,
    top_k: int = 20,
    min_count: int = 5,
    alpha0: float = 1000.0,
    text_col: str = "text",
) -> DataFrame:
    """Monroe-Colaresi-Quinn (2008) log-odds with an informative
    Dirichlet prior: which tokens are DISTINCTIVE of the ``in_group``
    half of the corpus, with the background token distribution as the
    prior so rare-word noise is shrunk instead of dominating (the
    fightin'-words fix to naive log-ratio term lists — the standard
    corpus-comparison readout for "what is different about this slice").

        delta_w = ln[(y_w^A + a_w) / (n^A + a0 - y_w^A - a_w)]
                - ln[(y_w^B + a_w) / (n^B + a0 - y_w^B - a_w)]
        var_w   = 1/(y_w^A + a_w) + 1/(y_w^B + a_w)
        z_w     = delta_w / sqrt(var_w)

    with a_w = alpha0 * total_w / total. Top-k by z desc (ties by
    token) — the in-group's signature terms.

    Shape: ONE token groupBy carrying both conditional counts
    (map-side combine, vocabulary-sized result), a broadcast 1-row
    totals fold, map-side z arithmetic, TakeOrderedAndProject cut —
    no windows, nothing data-sized after the explode."""
    tok = docs.select(
        F.explode(tokens(F.lower(F.col(text_col)))).alias("token"),
        in_group.cast("int").alias("__g"),
    ).where(F.col("token") != "")
    counts = tok.groupBy("token").agg(
        F.sum("__g").cast("bigint").alias("y_a"),
        F.sum(1 - F.col("__g")).cast("bigint").alias("y_b"),
    )
    counts = counts.where((F.col("y_a") + F.col("y_b")) >= min_count)
    wall = counts.agg(
        F.sum(F.col("y_a") + F.col("y_b")).cast("bigint").alias("total"),
        F.sum("y_a").cast("bigint").alias("n_a"),
        F.sum("y_b").cast("bigint").alias("n_b"),
    )
    j = counts.crossJoin(F.broadcast(wall))
    aw = (
        F.lit(alpha0)
        * (F.col("y_a") + F.col("y_b")).cast("double")
        / F.col("total").cast("double")
    )
    ya = F.col("y_a").cast("double")
    yb = F.col("y_b").cast("double")
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    delta = F.log(
        (ya + aw) / (na + F.lit(alpha0) - ya - aw)
    ) - F.log((yb + aw) / (nb + F.lit(alpha0) - yb - aw))
    var = F.lit(1.0) / (ya + aw) + F.lit(1.0) / (yb + aw)
    z = delta / F.sqrt(var)
    return (
        j.select("token", "y_a", "y_b", z.alias("z_logodds"))
        .orderBy(F.desc("z_logodds"), F.asc("token"))
        .limit(top_k)
    )


def compression_ratio(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    low: float = 0.30,
    high: float = 1.05,
) -> DataFrame:
    """Per-doc zlib compression ratio — the Gopher/RefinedWeb-family
    repetition filter the regex batteries can't replace: templated or
    looping text compresses far below natural language (ratio < ~0.3),
    while already-compressed or binary-ish payloads refuse to shrink
    (> ~1.0). Output: (doc_id, raw_bytes, compressed_bytes, ratio,
    keep_flag) with keep = low <= ratio <= high. Empty documents
    (raw_bytes = 0) have no defined ratio: ratio stays NULL but
    keep_flag is explicitly False — the repetition filter REJECTS empty
    docs rather than letting a NULL flag silently drop them from both
    keep- and reject-side filters downstream.

    zlib level 6 over UTF-8 bytes is deterministic for a given zlib, but
    NOT SQL-expressible — rows-only exposure, pinned against direct
    zlib.compress in tests. Arrow-batched mapInPandas (never per-row
    Python); map-only, fuses into the scan at any scale."""

    def _sizes(batches):
        import zlib

        for pdf in batches:
            enc = [(t or "").encode("utf-8") for t in pdf[text_col]]
            pdf = pdf[[id_col]].copy()
            pdf["raw_bytes"] = [len(b) for b in enc]
            pdf["compressed_bytes"] = [len(zlib.compress(b, 6)) for b in enc]
            yield pdf

    out = docs.select(id_col, text_col).mapInPandas(
        _sizes,
        schema=f"{id_col} long, raw_bytes bigint, compressed_bytes bigint",
    )
    ratio = F.when(
        F.col("raw_bytes") > 0,
        F.col("compressed_bytes").cast("double") / F.col("raw_bytes").cast("double"),
    )
    return out.select(
        id_col,
        "raw_bytes",
        "compressed_bytes",
        ratio.alias("ratio"),
        F.coalesce((ratio >= low) & (ratio <= high), F.lit(False)).alias(
            "keep_flag"
        ),
    ).orderBy(id_col)


def source_token_jsd(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between the unigram token
    distributions of every pair of ``group_col`` values — the symmetric,
    bounded ([0, ln 2] nats) corpus-drift measure used to compare crawl
    snapshots / sources before mixing them into a training run.

    Computed via the entropy identity JSD(P,Q) = H((P+Q)/2) -
    (H(P)+H(Q))/2 so absent tokens need no epsilon handling: per pair,
    the union-token frame carries m = (p+q)/2 with missing side
    coalesced to 0, and H(M) = -sum m ln m (m > 0 for every union
    token by construction).

    Token counts are exact integers; probabilities are one correctly-
    rounded division each; the entropy sums are vocabulary-sized float
    folds (association-order differences vs the oracle sit well inside
    the 6-decimal protocol rounding — the lang_token_entropy precedent).

    Scale: counts are one partial-aggregated shuffle on (group, token);
    everything after runs on vocabulary x pair-count rows, with the
    pair frame (G^2 rows) broadcast. G is assumed small (sources,
    snapshots); the op is quadratic in G, never in rows or vocabulary.
    """
    from pipeline_pyspark_etl_imdb_spark.operators.util import tracked_persist

    counts = (
        docs.select(F.col(group_col).alias("g"), tokens(F.col(text_col)).alias("toks"))
        .select("g", F.explode("toks").alias("token"))
        .groupBy("g", "token")
        .agg(F.count("*").alias("n"))
    )
    totals = counts.groupBy("g").agg(F.sum("n").alias("total"))
    # probs feeds FIVE downstream subtrees (H(P), the group domain, the
    # union-token frame, both sides of the pair join); without a persist
    # the full-corpus token explode + (g, token) shuffle — the dominant
    # cost — re-runs per consumer (the r3 cached-shingles lesson)
    probs = tracked_persist(
        counts.join(F.broadcast(totals), "g").select(
            "g",
            "token",
            (F.col("n").cast("double") / F.col("total").cast("double")).alias("p"),
        )
    )
    h = probs.groupBy("g").agg((-F.sum(F.col("p") * F.log("p"))).alias("h"))
    groups = probs.select("g").distinct()
    pairs = (
        groups.select(F.col("g").alias("ga"))
        .crossJoin(groups.select(F.col("g").alias("gb")))
        .where(F.col("ga") < F.col("gb"))
    )
    tok_union = (
        F.broadcast(pairs)
        .join(probs, (F.col("g") == F.col("ga")) | (F.col("g") == F.col("gb")))
        .select("ga", "gb", "token")
        .distinct()
    )
    joined = (
        tok_union.join(
            probs.select(F.col("g").alias("ga"), "token", F.col("p").alias("pa")),
            ["ga", "token"],
            "left",
        )
        .join(
            probs.select(F.col("g").alias("gb"), "token", F.col("p").alias("pb")),
            ["gb", "token"],
            "left",
        )
        .withColumn(
            "m",
            (F.coalesce(F.col("pa"), F.lit(0.0)) + F.coalesce(F.col("pb"), F.lit(0.0)))
            / F.lit(2.0),
        )
    )
    per_pair = joined.groupBy("ga", "gb").agg(
        F.count("*").cast("bigint").alias("n_union_tokens"),
        (-F.sum(F.col("m") * F.log("m"))).alias("hm"),
    )
    return (
        per_pair.join(F.broadcast(h.select(F.col("g").alias("ga"), F.col("h").alias("ha"))), "ga")
        .join(F.broadcast(h.select(F.col("g").alias("gb"), F.col("h").alias("hb"))), "gb")
        .select(
            F.col("ga").alias("source_a"),
            F.col("gb").alias("source_b"),
            "n_union_tokens",
            (F.col("hm") - (F.col("ha") + F.col("hb")) / F.lit(2.0)).alias("jsd_nats"),
            (
                (F.col("hm") - (F.col("ha") + F.col("hb")) / F.lit(2.0))
                / F.lit(math.log(2.0))
            ).alias("jsd_bits"),
        )
        .orderBy("source_a", "source_b")
    )
