"""Corpus-construction operators — the steps between "scored documents"
and "training shards": deterministic sharding, hash-based domain mixing,
sequence packing, and benchmark decontamination.

Beyond the reference surface (it has no corpus tooling at all); these are
the operations a 100 TB training-data pipeline runs after per-document
scoring/dedup (text.py, neardup.py) to assemble the final dataset.

Determinism policy matches text.py: randomness comes from md5 of the
document key (bit-identical on every engine), never from engine RNG — so
unlike seeded ``sample()``, every selection here hash-matches an external
oracle exactly. The uniform variate is the integer value of the first 4
hex chars of the md5 (65536 levels), extracted with ``instr`` arithmetic
that any SQL engine reproduces.

Scale notes: sharding/mixing/packing are map-only or one partitioned
window — no global sort, no driver-side state. Decontamination is an
equi-join on the shingle key with the (small) benchmark side broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.text import tokens, word_shingles
from pipeline_pyspark_etl_imdb_spark.operators.util import tracked_persist

_HEX = "0123456789abcdef"
HEX_LEVELS = 16**4  # resolution of the md5-derived uniform variate


def hex_uniform(hash_col: str, n_chars: int = 4, start: int = 0) -> Column:
    """Integer in [0, 16^n_chars) from hex chars [start, start+n_chars)
    of an md5 column — the engine-portable uniform variate (instr +
    integer arithmetic only; identical in Spark SQL and ANSI oracles).
    ``start`` lets one 32-hex md5 yield several independent uniforms
    (e.g. four 8-char variates), amortizing the hash over consumers."""
    # BIGINT arithmetic: with n_chars >= 8 the sum exceeds int32 and
    # Spark's plain INT literals would wrap silently (ANSI off)
    return F.expr(
        " + ".join(
            f"(CAST(instr('{_HEX}', substring({hash_col}, {start + i + 1}, 1)) AS BIGINT) - 1)"
            f" * CAST({16 ** (n_chars - 1 - i)} AS BIGINT)"
            for i in range(n_chars)
        )
    )


def hash_shard(
    df: DataFrame,
    n_shards: int = 32,
    id_col: str = "doc_id",
    salt: str = "shard",
) -> DataFrame:
    """Assign every row a deterministic output shard: md5(key:salt) mod
    n_shards. This is the write-path partitioner for training shards —
    content-stable (re-runs and other engines agree), uniform, and
    map-only (at 100 TB it fuses into the scan; the only data movement is
    the final partitionBy("shard") write)."""
    out = df.withColumn(
        "__h", F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    )
    return out.withColumn(
        "shard", (hex_uniform("__h") % n_shards).cast("int")
    ).drop("__h")


def domain_mix(
    docs: DataFrame,
    quotas: dict[str, float],
    lang_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Domain/language rebalancing: keep each document with probability
    ``quotas[domain]`` (missing domains drop), decided by the md5-derived
    uniform variate — NOT engine RNG, so the kept set is deterministic,
    engine-portable, and stable under re-partitioning (the property that
    makes incremental corpus rebuilds reproducible). Map-only filter."""
    out = docs.withColumn(
        "__h", F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    )
    quota: Column = F.lit(0.0)
    for domain, q in sorted(quotas.items()):
        quota = F.when(F.col(lang_col) == domain, F.lit(float(q))).otherwise(quota)
    u = hex_uniform("__h").cast("double") / float(HEX_LEVELS)
    return out.where(u < quota).drop("__h")


def pack_concat_split(
    docs: DataFrame,
    budget_tokens: int = 512,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequence packing, concat-and-split policy: within each shard,
    documents concatenate in key order and split into fixed
    ``budget_tokens`` windows; each document reports the sequence it
    starts in and its token offset there (documents may straddle a
    boundary — that is this policy, the one used when loss masking
    handles joins; strict greedy bin-packing is a stateful scan like
    eventtime.grouped_ema).

    All integer arithmetic over one partitioned window (running token
    count per shard) — no global sort; shards are independent, so at 100
    TB parallelism is n_shards x window-partition parallelism."""
    base = docs.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).cast("int").alias("shard"),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("bigint"))
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        F.floor(prev / budget_tokens).cast("bigint").alias("seq_idx"),
        (prev % budget_tokens).cast("bigint").alias("offset_tokens"),
    )


def contamination_check(
    docs: DataFrame,
    benchmark_ids_mod: int = 20,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: which training documents share k-word
    shingles with the held-out benchmark set (here: doc_id % mod == 0, a
    deterministic fixture stand-in for an external eval suite). Returns
    per contaminated document the count of overlapping shingles and of
    benchmark documents hit.

    Shape: distinct-shingle explode on both sides, equi-join on the
    shingle. The benchmark side is small by construction (eval suites are
    MBs, corpora are TBs) so it broadcasts — the corpus never shuffles."""
    shingled = (
        docs.select(id_col, F.col(text_col).alias("__t"))
        .withColumn("__tok", tokens("__t"))
        .select(id_col, F.explode(word_shingles("__tok", k)).alias("shingle"))
    )
    bench = shingled.where(F.col(id_col) % benchmark_ids_mod == 0).select(
        F.col(id_col).alias("bench_id"), "shingle"
    )
    cand = shingled.where(F.col(id_col) % benchmark_ids_mod != 0)
    return (
        cand.join(F.broadcast(bench), "shingle")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shared_shingles"),
            F.count_distinct("bench_id").alias("n_benchmarks_hit"),
        )
        .orderBy(id_col)
    )


BLOOM_BITS = 1 << 16  # m: bitmap size
BLOOM_HASHES = 4  # h: hash functions
_BLOOM_WORD_BITS = 32  # pack into positive-range BIGINT words (no sign games)


def bloom_decontaminate(
    docs: DataFrame,
    benchmark_ids_mod: int = 20,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bloom-filter decontamination — the 100 TB scale path for benchmark
    overlap. contamination_check joins every corpus shingle against the
    benchmark shingle set; at corpus scale the right shape is: compress
    the benchmark into an m-bit Bloom bitmap (here m=2^16, h=4 — eval
    suites are MBs, so the bitmap is KBs) and probe it map-side. A
    flagged doc is a CANDIDATE for the exact re-check (false positives
    possible at the standard (1-e^{-hn/m})^h rate); a clean doc is
    definitively clean (no false negatives, by construction — tested as
    a superset gate against contamination_check).

    All hashing is md5-derived (hex_uniform), the bitmap is bit_or over
    32-bit words packed in BIGINTs (positive range — no two's-complement
    portability games), so the flag set is deterministic and the oracle
    replicates it bit-for-bit. Physical shape: bitmap = one groupBy over
    the (small) benchmark side collapsing to <= m/32 rows; the probe is
    a broadcast join on the word index — the corpus side never shuffles,
    and the per-shingle cost is h bitmap lookups."""
    shingled = (
        docs.select(id_col, F.col(text_col).alias("__t"))
        .withColumn("__tok", tokens("__t"))
        .select(id_col, F.explode(word_shingles("__tok", k)).alias("shingle"))
    )
    js = F.explode(F.array(*[F.lit(j) for j in range(1, BLOOM_HASHES + 1)]))
    probes = shingled.withColumn("j", js).select(
        id_col,
        "shingle",
        "j",
        hex_uniform(
            "md5(concat(shingle, ':', CAST(j AS STRING)))", n_chars=4
        ).alias("bucket"),
    )
    probes = probes.select(
        id_col,
        "shingle",
        (F.col("bucket") / _BLOOM_WORD_BITS).cast("bigint").alias("word"),
        (F.col("bucket") % _BLOOM_WORD_BITS).cast("int").alias("bit"),
    )
    bench = probes.where(F.col(id_col) % benchmark_ids_mod == 0)
    bitmap = (
        bench.groupBy("word")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("mask"))
    )
    cand = probes.where(F.col(id_col) % benchmark_ids_mod != 0)
    hit = (
        cand.join(F.broadcast(bitmap), "word", "left")
        .select(
            id_col,
            "shingle",
            F.coalesce(
                F.expr("shiftright(mask, bit)") % 2, F.lit(0)
            ).alias("hit"),
        )
        .groupBy(id_col, "shingle")
        .agg(F.min("hit").alias("all_hit"))
    )
    return (
        hit.groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum("all_hit").alias("n_flagged"),
        )
        .where(F.col("n_flagged") > 0)
        .select(
            id_col,
            "n_shingles",
            F.col("n_flagged").cast("bigint").alias("n_flagged"),
        )
        .orderBy(id_col)
    )


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 64,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split long documents into overlapping token windows — the context-
    length normalizer that runs before packing. Chunk i covers tokens
    [i*stride, i*stride + max_tokens) with stride = max_tokens - overlap;
    a document of n tokens yields max(1, ceil((n - overlap) / stride))
    chunks, so every token lands in at least one chunk and consecutive
    chunks share ``overlap`` tokens.

    Map-only (explode of a per-row sequence) — fuses into the scan; the
    output multiplies rows by ~n/stride but never shuffles."""
    if overlap >= max_tokens:
        raise ValueError(f"overlap ({overlap}) must be < max_tokens ({max_tokens})")
    stride = max_tokens - overlap
    base = docs.select(
        id_col, tokens(F.col(text_col)).alias("__tok")
    ).withColumn("__n", F.size("__tok"))
    n_chunks = F.greatest(
        F.lit(1), F.ceil((F.col("__n") - overlap) / F.lit(stride)).cast("int")
    )
    out = base.select(
        id_col,
        "__tok",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    ).withColumn("__chunk", F.slice("__tok", F.col("chunk_idx") * stride + 1, max_tokens))
    return out.select(
        id_col,
        "chunk_idx",
        F.array_join("__chunk", " ").alias("chunk_text"),
        F.size("__chunk").cast("bigint").alias("n_tokens"),
    )


def chunk_exact_dedup(
    docs: DataFrame,
    chunk_tokens: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide exact chunk dedup (the MassiveText/C4 pattern at chunk
    granularity): split every document into consecutive ``chunk_tokens``
    windows, keep only the globally FIRST occurrence of each distinct
    chunk (first = minimum (doc_id, chunk_idx) — deterministic, engine-
    portable), and report per document how much text survives plus the
    md5 of the surviving text (the bytes a training run would keep).

    Returns (doc_id, n_chunks, n_kept, clean_md5) for every document;
    fully-duplicated documents appear with n_kept = 0 and NULL clean_md5.

    Scale shape: the keeper pick is one partially-aggregated groupBy on
    the (uniform) chunk hash; the keep decision is an equi-join back on
    the same hash (AQE co-partitions the two exchanges); reassembly is
    one doc-keyed aggregation whose collect_list is bounded by chunks-
    per-document, never corpus size. No window over the corpus, no
    driver state."""
    ch = chunk_documents(
        docs, max_tokens=chunk_tokens, overlap=0, text_col=text_col, id_col=id_col
    ).select(id_col, "chunk_idx", "chunk_text", F.md5("chunk_text").alias("__h"))
    keeper = ch.groupBy("__h").agg(
        F.min(F.struct(F.col(id_col), F.col("chunk_idx"))).alias("__first")
    )
    kept = ch.join(keeper, "__h").where(
        (F.col(id_col) == F.col("__first").getField(id_col))
        & (F.col("chunk_idx") == F.col("__first.chunk_idx"))
    )
    kept_agg = kept.groupBy(id_col).agg(
        F.count("*").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("chunk_idx", "chunk_text"))
                    ),
                    lambda s: s.getField("chunk_text"),
                ),
                " ",
            )
        ).alias("clean_md5"),
    )
    totals = ch.groupBy(id_col).agg(F.count("*").alias("n_chunks"))
    return totals.join(kept_agg, id_col, "left").select(
        id_col,
        "n_chunks",
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        "clean_md5",
    )


def group_hash_sample(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic k-per-group sample: rank rows within each group by
    md5(id:salt) and keep the first k — the engine-portable replacement
    for per-group reservoir sampling (same kept set on every engine,
    every re-run, every partitioning). One partitioned window; no global
    sort, no driver state. Use for balanced eval-set carve-outs."""
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def global_hash_sample(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic exact-k GLOBAL sample: order all rows by md5(id:salt)
    and keep the first k. The hash is uniform, so this is a uniform random
    sample with an exact size — but reproducible on any engine (unlike
    ``df.sample`` whose kept set is partitioning-dependent, and unlike
    reservoir sampling which needs driver state).

    Scale shape: Catalyst plans ORDER BY + LIMIT k as
    TakeOrderedAndProject — each partition keeps its local top-k by hash
    and the driver merges #partitions * k candidate rows. No global sort,
    no shuffle of the full table; 100 TB in, k rows out, one pass.
    """
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    return (
        df.withColumn("__h", h)
        .orderBy(F.col("__h").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("__h")
    )


def weighted_hash_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement (Efraimidis-
    Spirakis A-ES): each row draws u in (0,1) from md5(id:salt) and gets
    key = -ln(u) / weight; the k smallest keys win. Selection probability
    is proportional to weight (the standard training-data quality-/domain-
    weighted mixing primitive), yet the kept set is identical on every
    engine, partitioning and re-run — no RNG state, no driver involvement.

    Scale shape: same as ``global_hash_sample`` — ORDER BY key LIMIT k
    plans as TakeOrderedAndProject (per-partition top-k, driver merge of
    #partitions * k candidates); the full table never shuffles.

    Rows with NULL or non-positive weight are excluded (they'd have
    -inf/undefined keys; semantically weight 0 = never sample).
    """
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    keyed = df.where(F.col(weight_col).cast("double") > 0).withColumn("__h", h)
    # (h + 0.5) / 16^8: exact binary arithmetic on both engines; the +0.5
    # keeps u strictly inside (0,1) so ln(u) is finite
    u = (hex_uniform("__h", 8) + F.lit(0.5)) / F.lit(float(16**8))
    key = -F.log(u) / F.col(weight_col).cast("double")
    return (
        keyed.withColumn("__key", key)
        .orderBy(F.col("__key").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("__h", "__key")
    )


def corpus_build(
    docs: DataFrame,
    quotas: dict[str, float],
    quality_min: float = 0.5,
    n_shards: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """The end-to-end corpus assembly pipeline in one plan: quality
    filter -> exact-dedup (keep min-id canonical per identical text) ->
    domain rebalance -> shard assignment. Returns (doc_id, lang, shard)
    for every surviving document — the manifest a training run reads.

    Composition stays one Catalyst plan with ONE shuffle: the quality
    filter is an inline expression pushed into the scan (no score-frame
    join), the canonical pick is a min-id window over md5(text) (one
    exchange on a uniform key — no group-then-join-back), and mix+shard
    are map-only on the survivors (tests/test_plan_quality.py gates
    this shape). Near-dup dedup (neardup.py + components.py) slots in
    between dedup and mix when the corpus needs it; it is kept out of
    the default path because it is iterative, not single-plan."""
    from pipeline_pyspark_etl_imdb_spark.operators.text import quality_expr

    good = docs.where(quality_expr(F.col(text_col)) >= quality_min)
    w = Window.partitionBy(F.md5(F.col(text_col)))
    survivors = (
        good.withColumn("__min_id", F.min(id_col).over(w))
        .where(F.col(id_col) == F.col("__min_id"))
        .drop("__min_id")
    )
    mixed = domain_mix(survivors, quotas, lang_col=lang_col, id_col=id_col)
    return hash_shard(mixed, n_shards=n_shards, id_col=id_col).select(
        id_col, lang_col, "shard"
    )


def dataset_split(
    df: DataFrame,
    ratios: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: a content-stable uniform
    variate u = md5(id:salt)/2^32 cut at the cumulative ratio boundaries.

    MAP-ONLY — zero shuffle, fuses into the scan — which is why the split
    is proportional-in-expectation rather than exactly stratified: the
    exact variant needs a per-stratum row_number window whose partition
    count equals the stratum count (5 languages -> 5 tasks at 100 TB, a
    scale bug). Hash uniformity already lands each stratum within
    O(1/sqrt(n)) of the target fraction, and assignment is stable under
    corpus growth: adding documents never reassigns an existing id — the
    property that keeps yesterday's eval split out of tomorrow's train
    set."""
    if ratios is None:
        ratios = {"train": 0.9, "val": 0.05, "test": 0.05}
    out = df.withColumn(
        "__h", F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    ).withColumn("__u", hex_uniform("__h", 8).cast("double") / F.lit(4294967296.0))
    expr = None
    cum = 0.0
    names = list(ratios)
    for name in names[:-1]:
        cum += ratios[name]
        branch = F.when(F.col("__u") < F.lit(cum), F.lit(name))
        expr = branch if expr is None else expr.when(F.col("__u") < F.lit(cum), F.lit(name))
    expr = (
        expr.otherwise(F.lit(names[-1])) if expr is not None else F.lit(names[-1])
    )
    return out.withColumn("split", expr).drop("__u", "__h")


def split_leakage_report(
    docs: DataFrame,
    ratios: dict[str, float] | None = None,
    k: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "split",
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Cross-split NEAR-DUPLICATE leakage — the eval-integrity check
    exact-id splitting cannot give you: :func:`dataset_split` guarantees
    no document id crosses the train/val/test boundary, but a near-copy
    of a training doc landing in val/test still leaks (the C4/Dodge
    et al. failure mode), and this query measures exactly that.

    For every unordered split pair: the count of k-shingle Jaccard >=
    ``threshold`` pairs whose endpoints sit in DIFFERENT splits, the
    number of distinct documents involved, and the worst (max) crossing
    Jaccard. Empty result = no measurable leakage at the threshold.

    Scale shape: the pair generation IS :func:`neardup.jaccard_pairs`
    (shared-shingle equi-join, df-capped — no all-pairs anywhere); the
    split assignment is the map-only hash split; the report is two tiny
    aggregates over the crossing-pair frame. Nothing new shuffles at
    100 TB beyond what the dedup pass itself costs — which a pipeline
    runs anyway, so in production this report is a near-free by-product
    of dedup."""
    from pipeline_pyspark_etl_imdb_spark.operators.neardup import jaccard_pairs

    assign = dataset_split(docs, ratios, id_col=id_col, salt=salt).select(
        F.col(id_col).alias("__id"), "split"
    )
    pairs = jaccard_pairs(
        docs,
        k=k,
        threshold=threshold,
        text_col=text_col,
        id_col=id_col,
        max_shingle_df=max_shingle_df,
    )
    crossing = (
        pairs.join(
            assign.select(
                F.col("__id").alias("doc_a"), F.col("split").alias("__sa")
            ),
            "doc_a",
        )
        .join(
            assign.select(
                F.col("__id").alias("doc_b"), F.col("split").alias("__sb")
            ),
            "doc_b",
        )
        .where(F.col("__sa") != F.col("__sb"))
        .select(
            F.least("__sa", "__sb").alias("split_a"),
            F.greatest("__sa", "__sb").alias("split_b"),
            "doc_a",
            "doc_b",
            "jaccard",
        )
    )
    crossing = tracked_persist(crossing)
    pairs_per = crossing.groupBy("split_a", "split_b").agg(
        F.count("*").alias("n_crossing_pairs"),
        F.max("jaccard").alias("max_jaccard"),
    )
    docs_per = (
        crossing.select(
            "split_a", "split_b", F.explode(F.array("doc_a", "doc_b")).alias("d")
        )
        .groupBy("split_a", "split_b")
        .agg(F.count_distinct("d").alias("n_leaked_docs"))
    )
    return (
        pairs_per.join(docs_per, ["split_a", "split_b"])
        .select(
            "split_a",
            "split_b",
            "n_crossing_pairs",
            "n_leaked_docs",
            "max_jaccard",
        )
        .orderBy("split_a", "split_b")
    )


def contrastive_negatives(
    df: DataFrame,
    anchor_ids: list[int],
    k: int = 5,
    id_col: str = "doc_id",
    group_col: str = "lang",
) -> DataFrame:
    """Deterministic hard-negative sampling for contrastive training:
    for each anchor document, ``k`` pseudo-random candidates drawn from a
    DIFFERENT group (e.g. another language/domain — the standard
    in-batch-negatives exclusion), selected by ranking candidates on
    md5(anchor:candidate). The hash makes the draw content-stable: the
    same (anchor, corpus) always yields the same negatives, and adding
    documents only ever displaces, never reshuffles, the kept set.

    Output: (anchor_id, negative_id, rk) with rk 1..k per anchor.

    Scale shape: the anchor set is bounded and BROADCAST against the
    corpus (same contract as the kNN query sets); per-anchor selection is
    a rank window that compiles to WindowGroupLimit, so each partition
    forwards at most |anchors| * k rows — the corpus itself never
    shuffles. |anchors| * corpus candidate generation is map-side only."""
    from pyspark.sql import Window

    anchors = (
        df.where(F.col(id_col).isin(anchor_ids))
        .select(
            F.col(id_col).alias("anchor_id"),
            F.col(group_col).alias("__anchor_grp"),
        )
    )
    cands = df.select(
        F.col(id_col).alias("negative_id"), F.col(group_col).alias("__grp")
    )
    paired = (
        cands.join(F.broadcast(anchors), on=None, how="cross")
        .where(~F.col("__grp").eqNullSafe(F.col("__anchor_grp")))
        .withColumn(
            "__md5",
            F.md5(
                F.concat(
                    F.col("anchor_id").cast("string"),
                    F.lit(":"),
                    F.col("negative_id").cast("string"),
                )
            ),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(F.asc("__h"), F.asc("negative_id"))
    return (
        paired.withColumn("__h", hex_uniform("__md5", 12))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("anchor_id", "negative_id", F.col("rk").cast("int").alias("rk"))
        .orderBy("anchor_id", "rk")
    )


def curriculum_stages(
    docs: DataFrame,
    n_stages: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-ordered curriculum assignment: every document lands in one
    of ``n_stages`` equal-size stages by ascending quality score (stage 1
    = lowest quality, trained first under an easy-to-hard curriculum; or
    reverse the consumption order for anti-curriculum). Output
    (doc_id, quality, stage).

    Composition of two existing primitives: the inline quality expression
    (text.quality_expr — map-only) and the DISTRIBUTED ntile
    (ranks.total_order_ranks — range shuffle + broadcast partition
    offsets, no single-partition window). The order (quality, doc_id) is
    tie-free, so the ntile boundary is engine-exact and the oracle's
    window-function formulation hash-matches."""
    from pipeline_pyspark_etl_imdb_spark.operators.ranks import total_order_ranks
    from pipeline_pyspark_etl_imdb_spark.operators.text import quality_expr

    scored = docs.select(
        id_col, quality_expr(F.col(text_col)).alias("quality")
    )
    ranked = total_order_ranks(scored, ["quality", id_col], ntile=n_stages)
    return ranked.select(
        id_col, "quality", F.col("bucket").cast("int").alias("stage")
    ).orderBy(id_col)


def pack_best_fit(
    docs: DataFrame,
    budget_tokens: int = 512,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequence packing, first-fit-decreasing policy: within each shard,
    documents are placed whole into the first sequence with room, longest
    documents first (the classic FFD bin-packing heuristic — guaranteed
    within 11/9 OPT + 1 bins, and the policy used when loss masking does
    NOT span document joins, so a document must never straddle a
    sequence). Documents longer than the budget get a dedicated sequence.
    Output: (doc_id, shard, n_tokens, seq_idx) — deterministic: ties in
    length break by ascending id.

    Contrast pack_concat_split (the other packing policy in this module):
    that one is a pure window expression because documents may straddle;
    FFD is inherently sequential per shard, so it runs as an Arrow-batched
    applyInPandas over shard groups — the same bounded-group stateful-scan
    contract as eventtime.grouped_ema. Parallelism is n_shards; size
    n_shards so a shard's (id, length) pairs fit an executor (16 bytes a
    document — 10^8 docs/shard is ~1.6 GB, fine; the TEXT never moves)."""
    import pandas as pd

    base = docs.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).cast("int").alias("shard"),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("n_tokens"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        caps: list[int] = []  # remaining capacity per open sequence
        seq = []
        for t in pdf["n_tokens"]:
            need = int(t)
            placed = -1
            for j, cap in enumerate(caps):
                if cap >= need:
                    placed = j
                    break
            if placed < 0:
                caps.append(max(budget_tokens - need, 0))
                placed = len(caps) - 1
            else:
                caps[placed] -= need
            seq.append(placed)
        return pdf.assign(seq_idx=pd.Series(seq, dtype="int64"))

    return base.groupBy("shard").applyInPandas(
        _pack,
        schema=f"{id_col} bigint, shard int, n_tokens bigint, seq_idx bigint",
    )


def select_to_token_budget(
    docs: DataFrame,
    token_budget: int,
    n_buckets: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Data pruning to a token budget: keep the highest-quality documents
    (quality_expr order, doc_id tiebreak) until the budget is spent — a
    document survives iff the tokens of every strictly-better document
    sum to less than the budget. The "train on the best X tokens you can
    afford" selection step (the budgeted complement of curriculum_stages,
    which orders but never drops).

    A naive implementation is a cumulative sum over one global window —
    single-partition, the classic 100 TB killer. This runs the standard
    two-phase histogram cut instead:
      1. bucket docs by floor(quality * n_buckets) — monotone in the
         global order — and partially aggregate per-bucket token sums
         (<= n_buckets + 1 rows cross the wire);
      2. prefix-sum that SMALL frame (a window over <= 1001 rows, not
         over data) to classify each bucket: fully funded (prefix + sum
         < budget, with tokens >= 1 per doc every member's own prefix is
         below budget), exhausted (prefix >= budget), or THE boundary
         bucket;
      3. only boundary-bucket docs — one bucket's occupancy, not the
         corpus — enter a per-bucket ranking window for the exact cut.
    Quality is fixed-order rational double arithmetic (identical IEEE
    results in any engine), token counts are BIGINT-exact, so the kept
    set is engine-portable. Empty docs (0 tokens) are dropped up front —
    they carry no budget and would break the strict-prefix argument."""
    from pipeline_pyspark_etl_imdb_spark.operators.text import quality_expr

    scored = (
        docs.select(
            id_col,
            quality_expr(F.col(text_col)).alias("quality"),
            F.size(tokens(F.lower(F.col(text_col)))).cast("bigint").alias("n_tokens"),
        )
        # split('') is [''] (size 1), so the token-count guard alone
        # misses empty docs — their quality is NULL (0/0 punct ratio)
        # and a NULL bucket would vanish in the null-unsafe joins;
        # exclude them explicitly so both engines agree they cost no
        # budget
        .where((F.col("n_tokens") >= 1) & (F.length(F.col(text_col)) > 0))
        .withColumn(
            "__bucket", F.floor(F.col("quality") * n_buckets).cast("bigint")
        )
    )
    bucket_agg = scored.groupBy("__bucket").agg(F.sum("n_tokens").alias("__btok"))
    wb = (
        Window.orderBy(F.desc("__bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    classified = bucket_agg.withColumn(
        "__prefix", F.coalesce(F.sum("__btok").over(wb), F.lit(0).cast("bigint"))
    )
    full_buckets = classified.where(
        F.col("__prefix") + F.col("__btok") <= F.lit(token_budget)
    ).select("__bucket")
    boundary = classified.where(
        (F.col("__prefix") < F.lit(token_budget))
        & (F.col("__prefix") + F.col("__btok") > F.lit(token_budget))
    ).select("__bucket", "__prefix")

    kept_full = scored.join(F.broadcast(full_buckets), "__bucket", "semi")
    wdoc = (
        Window.partitionBy("__bucket")
        .orderBy(F.desc("quality"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    kept_boundary = (
        scored.join(F.broadcast(boundary), "__bucket")
        .withColumn(
            "__doc_prefix",
            F.col("__prefix")
            + F.coalesce(F.sum("n_tokens").over(wdoc), F.lit(0).cast("bigint")),
        )
        .where(F.col("__doc_prefix") < F.lit(token_budget))
    )
    return (
        kept_full.select(id_col, "n_tokens", "quality")
        .unionByName(kept_boundary.select(id_col, "n_tokens", "quality"))
        .orderBy(id_col)
    )


def neyman_stratified_sample(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    total_n: int,
    id_col: str,
    salt: str = "neyman",
) -> DataFrame:
    """Optimal-allocation stratified sampling (Neyman 1934, the survey
    design classic): the sample budget goes to strata in proportion to
    N_h * sigma_h — high-variance strata get more rows, near-constant
    strata barely any — which minimizes the variance of the stratified
    mean estimator at fixed cost. The missing piece between
    group_hash_sample (fixed k per group) and weighted_hash_sample
    (per-row weights): here the DESIGN ITSELF is computed from the data.

    Determinism end to end: per-stratum moments accumulate in DECIMAL
    (order-independent), sigma and the floor() allocation are fixed-order
    double expressions on those exact sums, and the draw is the md5-rank
    cut — so the sampled set hash-matches the oracle. Zero-variance
    strata get allocation 0 (their mean is already exact from any single
    row — by convention the estimator uses the stratum constant);
    allocations cap at the stratum size.

    Shape: ONE partial-aggregated moment pass (strata-sized result),
    allocation frame broadcast back, one rank window per stratum cut at
    the stratum's own allocation. The variable per-group limit keeps
    this a plain rank filter (WindowGroupLimit needs a literal), but the
    window is key-partitioned — no single-partition funnel."""
    vals = df.select(
        F.col(stratum_col).alias("stratum"),
        F.col(id_col).alias("sample_id"),
        # DECIMAL(12,2): 2-decimal money is exact, and the square stays
        # inside both engines' int128 decimal kernels (an 18,6 square
        # overflows the oracle engine's multiply)
        F.col(value_col).cast("decimal(12,2)").alias("__v"),
    ).where(F.col("__v").isNotNull())
    moments = vals.groupBy("stratum").agg(
        F.count("*").alias("n_h"),
        F.sum("__v").cast("double").alias("__s"),
        F.sum(F.col("__v") * F.col("__v")).cast("double").alias("__ss"),
    )
    var = F.when(
        F.col("n_h") > 1,
        F.greatest(
            F.lit(0.0),
            (F.col("__ss") - F.col("__s") * F.col("__s") / F.col("n_h"))
            / (F.col("n_h") - 1),
        ),
    ).otherwise(F.lit(0.0))
    weighted = moments.select(
        "stratum", "n_h", (F.col("n_h") * F.sqrt(var)).alias("__w")
    )
    tot = weighted.agg(
        F.sum("__w").alias("__wsum"), F.sum("n_h").alias("__nsum")
    )
    # all-zero variance across every stratum: Neyman weights carry no
    # signal, so fall back to PROPORTIONAL allocation — without this
    # guard 0/0 is NULL and least() would skip it, returning the whole
    # table and ignoring total_n entirely
    share = F.when(
        F.col("__wsum") > 0, F.col("__w") / F.col("__wsum")
    ).otherwise(F.col("n_h").cast("double") / F.col("__nsum"))
    alloc = (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "stratum",
            "n_h",
            F.least(
                F.col("n_h"),
                F.floor(F.lit(float(total_n)) * share).cast("bigint"),
            ).alias("alloc_n"),
        )
    )
    w = Window.partitionBy("stratum").orderBy(F.asc("__h"), F.asc("sample_id"))
    return (
        vals.withColumn(
            "__h",
            F.md5(F.concat(F.col("sample_id").cast("string"), F.lit(":" + salt))),
        )
        .join(F.broadcast(alloc), "stratum")
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= F.col("alloc_n"))
        .select("stratum", "sample_id", "alloc_n", F.col("n_h").alias("stratum_n"))
        .orderBy("stratum", "sample_id")
    )


def compaction_plan(
    files: DataFrame,
    partition_col: str,
    file_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Small-file compaction planning — the lakehouse maintenance pass
    that decides which files to rewrite together so a table converges on
    ~``target_bytes`` objects (the OPTIMIZE/compact primitive; at 100 TB
    the file listing is itself a DataFrame, so the planner must be a
    query, not a driver loop).

    Deterministic greedy sequential packing per partition: files in
    (``file_col``) order are assigned merge_group =
    cumulative_bytes_before_this_file div target_bytes — integer-exact,
    order-stable, and groups are contiguous in file order (preserving
    any clustering/Z-order the writer established; a bin-packing
    assignment would destroy it). A file can straddle a boundary; the
    guarantee is every group except a partition's last holds >=
    target_bytes, so the file count shrinks by ~total/target.

    One window (cumulative sum per partition) + one groupBy — both on
    the FILE-LISTING frame, which is ~rows/10^6 the data size. Output:
    one row per planned merge group with its file span and byte total.
    """
    assigned = files.select(
        F.col(partition_col),
        F.col(file_col),
        F.col(size_col).cast("bigint").alias("__bytes"),
    ).withColumn(
        "merge_group",
        F.expr(
            f"coalesce(sum(__bytes) over (partition by {partition_col} "
            f"order by {file_col} rows between unbounded preceding and "
            f"1 preceding), 0) div {int(target_bytes)}"
        ),
    )
    return (
        assigned.groupBy(partition_col, "merge_group")
        .agg(
            F.count("*").cast("bigint").alias("n_files"),
            F.sum("__bytes").cast("bigint").alias("group_bytes"),
            F.min(file_col).alias("first_file"),
            F.max(file_col).alias("last_file"),
        )
        .orderBy(partition_col, "merge_group")
    )
