"""Training-data selection operators: DSIR importance weighting,
duplicated-span coverage, staged quality funnels, and mixture planning.

Public references:
- Xie et al., "Data Selection for Language Models via Importance
  Resampling" (DSIR), NeurIPS 2023 — hashed n-gram importance weights
  log(p_target/p_raw) under bucketed bigram unigram models.
- Lee et al., "Deduplicating Training Data Makes Language Models
  Better", ACL 2022 — substring-level duplication, approximated here at
  k-token-span granularity (span occurrences, per-doc duplicate
  coverage) instead of a suffix array, which does not distribute.
- Rae et al., "Scaling Language Models: ... Gopher" §A1.1 — staged
  quality-filter funnels.
- Touvron et al., LLaMA — per-source mixture proportions / epoch
  (repeat-factor) planning.

Reference parity: /root/reference/src/etl_imdb.py has no data-selection
surface; these operators extend the engine for the 100 TB training-data
pipeline per the build brief (same extension family as operators/neardup.py
and operators/corpus.py).

Engine-portability rules (shared with the rest of the repo): all hashing
is md5-derived (`hex_uniform`), never engine-native hash(); counts and
positions stay integer-exact; doubles appear only as a final division or
a final ln() of a single division (the `doc_unigram_logprob` precedent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.corpus import hex_uniform
from pipeline_pyspark_etl_imdb_spark.operators.text import bigram_list, tokens


def _token_frame(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return docs.select(
        id_col, F.lower(F.col(text_col)).alias("__t")
    ).withColumn("__tok", tokens("__t"))


def dsir_logweights(
    docs: DataFrame,
    target: Column,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance log-weights per document (Xie et al. 2023).

    Features are hashed bigrams: bucket = md5(bigram) mod ``n_buckets``.
    Two unigram-over-buckets models are fit — one on documents matching
    the ``target`` predicate (the distribution you want more of), one on
    the full raw corpus — with add-one smoothing, and each document
    scores ``sum_b n_b * (ln p_target(b) - ln p_raw(b))``. Positive
    weight = looks more like the target than the raw corpus; downstream
    selection keeps top-weight docs (or Gumbel-resamples on the weights).

    Scale shape (100 TB): both models are ``n_buckets``-row frames built
    by partially-aggregated groupBys over the bigram stream (the explode
    fuses into the scan; the shuffle moves at most ``n_buckets`` rows per
    partition). The per-doc pass partially aggregates to at most
    ``n_buckets`` rows per document BEFORE joining the broadcast model —
    no vocabulary broadcast, no quadratic term, two scans of the corpus.
    ln() is applied to a single double division per model (bucket counts
    and totals stay BIGINT-exact), the engine-portable pattern the
    unigram_logprob oracle established.
    """
    base = docs.select(
        id_col,
        F.coalesce(target, F.lit(False)).alias("__target"),
        F.lower(F.col(text_col)).alias("__t"),
    ).withColumn("__tok", tokens("__t"))
    grams = base.select(
        id_col, "__target", F.explode(bigram_list("__tok")).alias("bigram")
    ).withColumn(
        "bucket",
        (hex_uniform(f"md5(bigram)") % n_buckets).cast("int"),
    )

    counts = grams.groupBy("bucket").agg(
        F.count("*").alias("c_raw"),
        F.sum(F.col("__target").cast("bigint")).alias("c_tgt"),
    )
    model = (
        counts.crossJoin(
            F.broadcast(
                counts.agg(
                    F.sum("c_raw").alias("t_raw"),
                    F.sum("c_tgt").alias("t_tgt"),
                )
            )
        )
        .select(
            "bucket",
            (
                F.log(
                    (F.col("c_tgt") + 1).cast("double")
                    / (F.col("t_tgt") + F.lit(n_buckets))
                )
                - F.log(
                    (F.col("c_raw") + 1).cast("double")
                    / (F.col("t_raw") + F.lit(n_buckets))
                )
            ).alias("lw"),
        )
    )

    per_doc_bucket = grams.groupBy(id_col, "bucket").agg(
        F.count("*").alias("n")
    )
    return (
        per_doc_bucket.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("n_bigrams"),
            F.sum(F.col("n") * F.col("lw")).alias("dsir_logweight"),
        )
    )


def span_rows(
    docs: DataFrame, k: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Positional k-token spans: one row per (doc, start position, span
    text), duplicates kept — the rolling-window substring stream behind
    repeated-span detection. Docs shorter than ``k`` tokens emit nothing
    (a span IS k tokens; there is no partial-span semantics to invent).
    Map-only: the transform/posexplode fuses into the scan."""
    base = _token_frame(docs, text_col, id_col)
    spans = F.expr(
        f"CASE WHEN size(__tok) >= {k} THEN "
        f"transform(sequence(0, size(__tok) - {k}), "
        f"i -> struct(i AS pos, concat_ws(' ', slice(__tok, i + 1, {k})) AS span)) "
        f"ELSE array() END"
    )
    return (
        base.withColumn("__s", F.explode(spans))
        .select(id_col, F.col("__s.pos").alias("pos"), F.col("__s.span").alias("span"))
    )


def repeated_spans(
    docs: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document repeated k-token spans (the distributable stand-in
    for Lee et al. 2022's suffix-array substring dedup): spans occurring
    in at least ``min_docs`` distinct documents, with occurrence and
    document counts.

    Scale shape: ONE partially-aggregated groupBy on span text — linear
    in corpus size, no self-join, no pair materialization (a span shared
    by a million docs costs one aggregate row, unlike shingle-join
    candidate generation). count(distinct) over the group is the only
    two-phase part and Spark plans it as the standard expand+two-agg."""
    rows = span_rows(docs, k=k, text_col=text_col, id_col=id_col)
    return (
        rows.groupBy("span")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct(id_col).alias("n_docs"),
        )
        .where(F.col("n_docs") >= min_docs)
        .select(F.md5("span").alias("span_hash"), "span", "n_docs", "n_occurrences")
    )


def span_dup_coverage(
    docs: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicate coverage: the fraction of token positions
    covered by at least one k-token span that also appears in
    ``min_docs``-or-more distinct documents — the actual drop signal of
    substring-level dedup (docs past a coverage threshold are boilerplate
    and get removed or trimmed).

    Scale shape: span stats are the linear groupBy above; occurrences
    join their span's doc-frequency back by span text (one shuffle, one
    row per occurrence — never pairs); covered positions explode by at
    most k per duplicated occurrence and distinct-count per doc. Every
    step is linear in corpus size * k. Docs with no duplicated span (or
    shorter than k tokens) report coverage 0 via the left join."""
    rows = span_rows(docs, k=k, text_col=text_col, id_col=id_col)
    stats = rows.groupBy("span").agg(F.countDistinct(id_col).alias("n_docs"))
    dup_occ = rows.join(
        stats.where(F.col("n_docs") >= min_docs).select("span"), "span"
    )
    covered = (
        dup_occ.select(
            id_col,
            F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))).alias(
                "cpos"
            ),
        )
        .groupBy(id_col)
        .agg(F.countDistinct("cpos").alias("n_covered"))
    )
    n_tok = _token_frame(docs, text_col, id_col).select(
        id_col, F.size("__tok").cast("bigint").alias("n_tokens")
    )
    return (
        n_tok.join(covered, id_col, "left")
        .na.fill({"n_covered": 0})
        .select(
            id_col,
            "n_tokens",
            F.col("n_covered").cast("bigint").alias("n_covered"),
            (F.col("n_covered").cast("double") / F.col("n_tokens")).alias(
                "dup_coverage"
            ),
        )
    )


FUNNEL_STAGES: tuple[str, ...] = (
    "flag_word_count",
    "flag_mean_len",
    "flag_alpha",
    "flag_stop",
)


def quality_funnel(docs: DataFrame, **gopher_kwargs) -> DataFrame:
    """Staged quality-filter funnel over the Gopher rule battery: for each
    stage (applied in the fixed order word-count → mean-word-length →
    alpha-ratio → stopwords), how many documents entered it, passed it
    cumulatively, and were dropped AT it — the pipeline-observability
    report every production filter chain ships with (which rule is doing
    the cutting, and in what order-dependent share).

    One pass: the per-doc flags are map-only expressions, and the funnel
    is a single global aggregate of conditional sums (partial-aggregated;
    the shuffle carries one row per partition). The stage rows are then
    unpivoted from that single aggregate row — constant-size work."""
    from pipeline_pyspark_etl_imdb_spark.operators.text import gopher_quality_flags

    flags = gopher_quality_flags(docs, **gopher_kwargs)
    surv: Column = F.lit(True)
    aggs = [F.count("*").alias("n_total")]
    for i, stage in enumerate(FUNNEL_STAGES):
        surv = surv & F.col(stage)
        aggs.append(F.sum(surv.cast("bigint")).alias(f"__s{i}"))
    row = flags.agg(*aggs)
    stack_args = ", ".join(
        f"'{stage}', __s{i}, {'n_total' if i == 0 else f'__s{i - 1}'}"
        for i, stage in enumerate(FUNNEL_STAGES)
    )
    return (
        row.select(
            F.expr(
                f"stack({len(FUNNEL_STAGES)}, {stack_args}) AS (stage, n_passed, n_entered)"
            )
        )
        .select(
            "stage",
            F.col("n_entered").cast("bigint").alias("n_entered"),
            F.col("n_passed").cast("bigint").alias("n_passed"),
            (F.col("n_entered") - F.col("n_passed")).cast("bigint").alias("n_dropped"),
        )
    )


def mixing_epochs_plan(
    docs: DataFrame,
    quotas: dict[str, float],
    token_budget: int,
    domain_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Mixture/epoch planning (the LLaMA-style sampling-proportions
    table): given target mixture shares per domain and a total token
    budget, report per domain the available token supply, the planned
    token draw ``floor(budget * share)``, and the repeat factor
    (epochs) ``planned / available`` — >1 means the domain will be
    upsampled (seen more than once), <1 subsampled.

    One partially-aggregated groupBy over the token stream (token counts
    fuse into the scan); the quota mapping is a literal CASE chain, so
    the whole plan is scan + one small-keyed aggregate regardless of
    corpus size. Domains without a quota are excluded (they get no
    budget), matching domain_mix's drop semantics. planned_tokens stays
    BIGINT-exact; repeat_factor is the single final double division."""
    tok = docs.select(
        F.col(domain_col).alias("domain"),
        F.size(tokens(F.lower(F.col(text_col)))).cast("bigint").alias("n_tok"),
    )
    share: Column = F.lit(None).cast("double")
    for domain, q in sorted(quotas.items()):
        share = F.when(F.col("domain") == domain, F.lit(float(q))).otherwise(share)
    per_domain = (
        tok.groupBy("domain")
        .agg(F.sum("n_tok").alias("available_tokens"))
        .withColumn("target_share", share)
        .where(F.col("target_share").isNotNull())
    )
    return per_domain.select(
        "domain",
        "available_tokens",
        "target_share",
        F.floor(F.lit(float(token_budget)) * F.col("target_share"))
        .cast("bigint")
        .alias("planned_tokens"),
        (
            F.floor(F.lit(float(token_budget)) * F.col("target_share")).cast("double")
            / F.col("available_tokens")
        ).alias("repeat_factor"),
    )


def temperature_mix_plan(
    docs: DataFrame,
    token_budget: int,
    domain_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-scaled multilingual mixing (the mT5/XLM-R recipe,
    Xue et al. 2021 sec 3.2): sample domain l with probability
    q_l = p_l^alpha / sum_m p_m^alpha where p_l is the natural token
    share — alpha < 1 flattens the distribution so low-resource domains
    are upsampled without hand-written quotas (the complement of
    mixing_epochs_plan, which takes explicit target shares).

    Fixed at alpha = 0.5 so the power is sqrt(), which IEEE 754 requires
    to be correctly rounded — the per-domain numerator is bit-identical
    across engines (a libm pow(x, 0.3) would not be), and the
    denominator's sum-order ulps sit far below the 6-decimal comparison
    resolution. Since p_l^0.5 / sum p_m^0.5 = sqrt(n_l) / sum sqrt(n_m),
    the corpus total N cancels and only integer token counts enter.

    Shape: ONE partially-aggregated groupBy over the token stream to
    domain granularity (domains are few — the aggregate output is a
    handful of rows), then a one-row denominator frame broadcast back.
    Reports per domain: available tokens, natural share, temperature
    share, planned draw floor(budget * q_l), and the repeat factor
    (epochs over the domain's supply; >1 = upsampled)."""
    per_domain = (
        docs.select(
            F.col(domain_col).alias("domain"),
            F.size(tokens(F.lower(F.col(text_col)))).cast("bigint").alias("n_tok"),
        )
        .groupBy("domain")
        .agg(F.sum("n_tok").alias("available_tokens"))
    )
    denom = per_domain.agg(
        F.sum("available_tokens").alias("__total_tokens"),
        F.sum(F.sqrt(F.col("available_tokens").cast("double"))).alias("__sqrt_sum"),
    )
    planned = F.floor(
        F.lit(float(token_budget))
        * (F.sqrt(F.col("available_tokens").cast("double")) / F.col("__sqrt_sum"))
    ).cast("bigint")
    return per_domain.crossJoin(F.broadcast(denom)).select(
        "domain",
        "available_tokens",
        (F.col("available_tokens").cast("double") / F.col("__total_tokens")).alias(
            "raw_share"
        ),
        (F.sqrt(F.col("available_tokens").cast("double")) / F.col("__sqrt_sum")).alias(
            "temp_share"
        ),
        planned.alias("planned_tokens"),
        (planned.cast("double") / F.col("available_tokens")).alias("repeat_factor"),
    )


def span_dedup_trim(
    docs: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Substring-level dedup as a TRANSFORMATION (Lee et al. 2022's
    ExactSubstr removal, at k-token-span granularity): span_dup_coverage
    scores the damage, this rewrites the corpus. For every k-token span
    occurring in >= min_docs distinct documents, exactly ONE occurrence
    survives — the (lowest doc_id, lowest pos) keeper — and every other
    occurrence has its k token positions deleted; each document comes
    back as the ordered concatenation of its kept tokens (whitespace
    normalized to single spaces — the token stream is the unit of this
    operator, as in the paper's tokenized-corpus setting).

    Per doc: (n_tokens, n_removed, trimmed_text). Docs shorter than k
    tokens pass through untouched.

    Scale shape: the span table is linear in corpus x k (no self-join —
    a span in 10^6 docs is one aggregate row); the keeper is a
    lexicographic min(struct(doc, pos)) inside that same partial
    aggregate, NOT a window over occurrences; removal positions explode
    by at most k per duplicated occurrence; reassembly is one left join
    back to the token frame and a map-only indexed filter. Deterministic
    end to end (keep-first policy, integer positions), so the rewritten
    text hash-matches the oracle."""
    rows = span_rows(docs, k=k, text_col=text_col, id_col=id_col)
    keepers = (
        rows.groupBy("span")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.min(
                F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))
            ).alias("keep"),
        )
        .where(F.col("n_docs") >= min_docs)
        .select("span", F.col("keep.d").alias("__kd"), F.col("keep.p").alias("__kp"))
    )
    removed = (
        rows.join(keepers, "span")
        .where(~((F.col(id_col) == F.col("__kd")) & (F.col("pos") == F.col("__kp"))))
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
            ).alias("rpos"),
        )
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_set("rpos")).alias("__removed"))
    )
    base = _token_frame(docs, text_col, id_col)
    return (
        base.join(removed, id_col, "left")
        .withColumn(
            "__removed",
            F.coalesce(F.col("__removed"), F.expr("CAST(array() AS array<int>)")),
        )
        .select(
            id_col,
            F.size("__tok").cast("bigint").alias("n_tokens"),
            F.size("__removed").cast("bigint").alias("n_removed"),
            F.concat_ws(
                " ",
                F.filter(
                    "__tok",
                    lambda t, i: ~F.array_contains(F.col("__removed"), i),
                ),
            ).alias("trimmed_text"),
        )
    )


def dsir_importance_sample(
    docs: DataFrame,
    target: Column,
    k: int = 200,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir",
) -> DataFrame:
    """The DSIR selection step: a deterministic importance-weighted draw
    of ``k`` documents with probability proportional to exp(logweight) —
    the resampling that actually builds the target-shaped corpus from
    the weights ``dsir_logweights`` scores (Xie et al. 2023 sample via
    Gumbel top-k; this is the equivalent Efraimidis-Spirakis order
    computed wholly in LOG space).

    Key algebra: A-ES ranks by -ln(u)/w ascending. With w =
    exp(logweight), ln is monotone on the positive keys, so ranking by
    ln(-ln(u)) - logweight selects the IDENTICAL set and order while
    never exponentiating — no overflow for extreme weights, and only
    ln() calls (the established engine-portable double pattern; md5-hex
    uniforms as in weighted_hash_sample).

    Scale shape: the weight pass is dsir_logweights' two corpus scans;
    the draw is ORDER BY key LIMIT k = TakeOrderedAndProject (per-
    partition top-k, no global sort). Output: (doc_id, n_bigrams,
    dsir_logweight) of the kept docs."""
    from pipeline_pyspark_etl_imdb_spark.operators.corpus import hex_uniform

    lw = dsir_logweights(docs, target, n_buckets, text_col, id_col)
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    u = (hex_uniform("__h", 8) + F.lit(0.5)) / F.lit(float(16**8))
    key = F.log(-F.log(u)) - F.col("dsir_logweight")
    return (
        lw.withColumn("__h", h)
        .withColumn("__key", key)
        .orderBy(F.col("__key").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("__h", "__key")
    )


def quantile_normalize_scores(
    df: DataFrame,
    group_col: str,
    score: Column,
    id_col: str,
) -> DataFrame:
    """Map each group's score distribution onto the POOLED distribution —
    the cross-source calibration step before a global selection cut
    (quality scorers drift per source: a 0.6 from a clean crawl and a
    0.6 from a forum dump are not the same quantity; after quantile
    normalization a global budget cut like quality_token_budget compares
    like with like).

    Each row maps to p = (midrank - 0.5) / n_g within its group (midrank
    = min-rank + half the tie width, the grouped_spearman convention;
    p < 1 strictly), then to the pooled interpolated quantile at
    pos = p * (N - 1) — the SQL quantile_cont convention: normalized =
    (1 - frac) * v[floor(pos)] + frac * v[floor(pos) + 1] over the
    0-based pooled order statistics.

    Engine-exact: midranks and the pooled order are integer/tie-free
    ((score, id) total order; equal scores make position->value
    well-defined regardless of tie permutation), and p, pos, frac, and
    the blend are one fixed correctly-rounded double tree shared with
    the oracle.

    Scale shape: two group-partitioned windows (midrank, n_g), the
    distributed total-order rank for the pooled order statistics
    (ranks.total_order_ranks — range shuffle + a partition-count-bounded
    offsets window, never a single-partition data window), and two
    integer-key equi-joins to fetch v[lo] / v[hi]. Nothing quadratic,
    nothing driver-side.
    """
    from pipeline_pyspark_etl_imdb_spark.operators.ranks import total_order_ranks

    base = df.select(F.col(id_col), F.col(group_col), score.alias("score"))
    n_tot = base.agg(F.count("*").cast("bigint").alias("__N"))
    w_rank = Window.partitionBy(group_col).orderBy("score")
    w_tie = Window.partitionBy(group_col, "score")
    w_grp = Window.partitionBy(group_col)
    midrank = (
        F.rank().over(w_rank).cast("double")
        + (F.count("*").over(w_tie).cast("double") - F.lit(1.0)) / F.lit(2.0)
    )
    ranked = base.select(
        id_col,
        group_col,
        "score",
        midrank.alias("__mid"),
        F.count("*").over(w_grp).cast("double").alias("__ng"),
    )
    pooled = total_order_ranks(base, ["score", id_col]).select(
        F.col("global_rn").alias("__rn"), F.col("score").alias("__v")
    )
    pos = (
        (F.col("__mid") - F.lit(0.5))
        / F.col("__ng")
        * (F.col("__N").cast("double") - F.lit(1.0))
    )
    with_pos = (
        ranked.crossJoin(F.broadcast(n_tot))
        .withColumn("__pos", pos)
        .withColumn("__lo", F.floor(F.col("__pos")).cast("bigint"))
        .withColumn("__frac", F.col("__pos") - F.col("__lo").cast("double"))
    )
    lo_side = pooled.select(F.col("__rn").alias("__lo_rn"), F.col("__v").alias("__vlo"))
    hi_side = pooled.select(F.col("__rn").alias("__hi_rn"), F.col("__v").alias("__vhi"))
    return (
        with_pos.join(lo_side, F.col("__lo") + F.lit(1) == F.col("__lo_rn"))
        .join(
            hi_side,
            F.least(F.col("__lo") + F.lit(2), F.col("__N")) == F.col("__hi_rn"),
        )
        .select(
            id_col,
            group_col,
            "score",
            (
                (F.lit(1.0) - F.col("__frac")) * F.col("__vlo")
                + F.col("__frac") * F.col("__vhi")
            ).alias("normalized"),
        )
        .orderBy(id_col)
    )
