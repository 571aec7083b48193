"""Near-duplicate detection: exact groups, n-gram Jaccard, MinHash-LSH,
SimHash.

Design for a DuckDB-checkable, 100 TB-ready dedup stack:

- All hashing is md5 (bit-identical across engines) — NOT Spark's native
  murmur3 ``hash()`` — so every stage here, including the LSH banding,
  hash-matches an ANSI-SQL oracle.
- The scale path is MinHash-LSH (or SimHash chunk-join): candidate pairs
  come from an equi-join on band/chunk keys, never from an O(n^2) cross
  join. Exact Jaccard runs only on candidates (or small data) as the
  verifier — the same verify-after-LSH shape production dedup uses.
- All stages are built-in expressions: explode/groupBy/join — fully
  inside Catalyst, shuffles only on band keys (uniform md5 values — no
  skew by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.text import tokens, word_shingles
from pipeline_pyspark_etl_imdb_spark.operators.util import fan_out, tracked_persist


def exact_dup_groups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-duplicate groups: hash-groupBy on the full text. Returns one
    row per distinct text with its population and canonical (minimum) id —
    the distributed version of 'keep first, count the rest'."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("canonical_doc_id"),
        )
    )


def shingle_sets(
    docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, shingle) rows: distinct k-word shingles per document.

    Fans the doc scan out first: shingling multiplies rows ~50x and the
    subsequent signature hashing is CPU-bound, so a single-file scan must
    not serialize it (operators/util.fan_out is a no-op on well-split
    inputs)."""
    return (
        fan_out(docs).select(id_col, F.col(text_col).alias("__t"))
        .withColumn("__tok", tokens("__t"))
        .select(id_col, F.explode(word_shingles("__tok", k)).alias("shingle"))
    )


def df_capped_shingles(
    sh: DataFrame, max_shingle_df: int, shingle_col: str = "shingle"
) -> DataFrame:
    """Drop shingles whose document frequency exceeds ``max_shingle_df``
    (the MassiveText/C4 boilerplate guard). A shingle shared by f docs
    contributes f^2 rows to any shingle self-join, so one boilerplate
    shingle in 10^6 docs alone yields 10^12 candidate rows; capping df
    bounds the join output by cap * |shingle rows| — linear, not
    quadratic. One shuffle (count over the shingle partition); the
    downstream equi-join reuses the same hash partitioning."""
    w = Window.partitionBy(shingle_col)
    return (
        sh.withColumn("__df", F.count("*").over(w))
        .where(F.col("__df") <= max_shingle_df)
        .drop("__df")
    )


def jaccard_pairs(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs above a threshold.

    Shingle-level self-join: only documents sharing at least one shingle
    ever meet, so the join output is bounded by true overlap, not n^2 —
    EXCEPT for boilerplate shingles shared by huge document populations,
    whose f^2 blowup is the classic dedup scale-killer. ``max_shingle_df``
    removes those before the join (df_capped_shingles); the Jaccard is
    then computed consistently over the capped shingle universe (sizes
    AND intersections), i.e. similarity over *discriminative* shingles.
    At the fixture scales the observed max df is 25, so the default cap
    of 1000 never binds there and the capped result equals the uncapped
    one; the DuckDB oracle encodes the same cap.

    At 100 TB this is still the verifier stage — run it after LSH
    candidate generation (minhash_candidate_pairs), not on the full corpus.
    Jaccard = |A∩B| / (|A|+|B|-|A∩B|) with exact integer counts; the only
    float op is one final division.
    """
    sh = shingle_sets(docs, k, text_col, id_col)
    return jaccard_pairs_from_shingles(sh, threshold, id_col, max_shingle_df)


def jaccard_pairs_from_shingles(
    sh: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """:func:`jaccard_pairs` over a PRE-SHINGLED (id, shingle) frame —
    for callers that already materialized the per-doc distinct-shingle
    rows (the dedup cascade reuses the containment stage's persisted
    postings, saving a second full-corpus tokenize+explode). Semantics
    identical to jaccard_pairs: df-cap first, then exact intersection/
    union counts over the capped universe."""
    if max_shingle_df is not None:
        # persist the capped rows: FOUR consumers (a-side, b-side, two size
        # frames) read this subtree, and Spark does not reuse exchanges
        # across the aliased copies — without the cache the shingle
        # explode + df window would run four times per query (measured on
        # the executed plan). MEMORY_AND_DISK spills gracefully at corpus
        # scale; released by the harness via util.release_tracked().
        sh = tracked_persist(df_capped_shingles(sh, max_shingle_df))
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def incremental_ingest_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    candidate_source: str = "lsh",
) -> DataFrame:
    """Incremental corpus ingestion: keep only batch documents that are
    (1) not byte-identical to any corpus document, (2) not byte-identical
    to an earlier batch document (min-id survivor), and (3) not a near-dup
    (k-shingle Jaccard >= threshold) of any corpus document.

    Shapes: exact checks are md5 equi-anti-joins (uniform keys, one
    shuffle each); the near-dup check is a shingle-level equi-join between
    batch and corpus — bounded by true overlap, never |batch| x |corpus|.

    ``candidate_source``: "lsh" (default — minhash band keys generate
    cross-set candidates first and ONLY those pairs are shingle-verified;
    the 100 TB path, because the raw cross-set shingle join inherits the
    hot-shingle f^2 blowup) or "exact" — every shingle-sharing pair is
    Jaccard-verified; what the oracle registry query replicates. LSH
    recall < 1 means it can only MISS near-dups, so its kept set is
    always a superset of the exact path's (gated in
    tests/test_ingest_dedup.py).
    """
    if candidate_source not in ("exact", "lsh"):
        raise ValueError(f"unknown candidate_source: {candidate_source!r}")
    b_hash = batch.withColumn("__h", F.md5(F.col(text_col)))
    c_hash = corpus.select(F.md5(F.col(text_col)).alias("__h")).distinct()
    # (1) exact vs corpus
    fresh = b_hash.join(c_hash, "__h", "left_anti")
    # (2) exact within batch: first occurrence (min id) survives
    w_min = F.min(id_col).over(Window.partitionBy("__h"))
    fresh = (
        fresh.withColumn("__keep", F.col(id_col) == w_min)
        .where("__keep")
        .drop("__keep", "__h")
    )
    # (3) near-dup vs corpus: cross-frame shingle join -> exact Jaccard
    b_side, c_side = fresh, corpus
    cand = None
    if candidate_source == "lsh":
        b_bands = minhash_band_keys(
            minhash_signatures(fresh, k=k, text_col=text_col, id_col=id_col),
            id_col=id_col,
        )
        c_bands = minhash_band_keys(
            minhash_signatures(corpus, k=k, text_col=text_col, id_col=id_col),
            id_col=id_col,
        )
        cand = (
            b_bands.select(F.col(id_col).alias("b_id"), "band_id", "band_val")
            .join(
                c_bands.select(F.col(id_col).alias("c_id"), "band_id", "band_val"),
                ["band_id", "band_val"],
            )
            .select("b_id", "c_id")
            .distinct()
        )
        cand = tracked_persist(cand)
        # shingle-verify ONLY candidate docs — at scale this shrinks the
        # verification join from the corpus to the banded survivors
        b_side = fresh.join(
            cand.select(F.col("b_id").alias(id_col)).distinct(), id_col, "left_semi"
        )
        c_side = corpus.join(
            cand.select(F.col("c_id").alias(id_col)).distinct(), id_col, "left_semi"
        )
    b_sh = shingle_sets(b_side, k, text_col, id_col)
    c_sh = shingle_sets(c_side, k, text_col, id_col)
    b_sizes = b_sh.groupBy(id_col).agg(F.count("*").alias("n_b"))
    c_sizes = c_sh.groupBy(id_col).agg(F.count("*").alias("n_c"))
    inter = (
        b_sh.select(F.col(id_col).alias("b_id"), "shingle")
        .join(c_sh.select(F.col(id_col).alias("c_id"), "shingle"), "shingle")
        .groupBy("b_id", "c_id")
        .agg(F.count("*").alias("n_inter"))
    )
    if cand is not None:
        inter = inter.join(cand, ["b_id", "c_id"], "left_semi")
    near = (
        inter.join(b_sizes.select(F.col(id_col).alias("b_id"), "n_b"), "b_id")
        .join(c_sizes.select(F.col(id_col).alias("c_id"), "n_c"), "c_id")
        .where(
            F.col("n_inter").cast("double")
            / (F.col("n_b") + F.col("n_c") - F.col("n_inter"))
            >= threshold
        )
        .select(F.col("b_id").alias(id_col))
        .distinct()
    )
    return fresh.join(near, id_col, "left_anti")


def minhash_signatures(
    docs: DataFrame,
    n_hashes: int = 16,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signature per document: h_j = min over shingles of
    md5(j || ':' || shingle). One groupBy computes all permutations as
    independent min() aggregates (map-side partial aggregation, single
    shuffle on doc id)."""
    sh = shingle_sets(docs, k, text_col, id_col)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle")))).alias(f"h{j}")
        for j in range(n_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_band_keys(
    sigs: DataFrame, n_hashes: int = 16, rows_per_band: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """LSH banding: concatenate each band's signature rows into one md5
    band value; one output row per (doc, band)."""
    if n_hashes % rows_per_band != 0:
        raise ValueError(
            f"n_hashes ({n_hashes}) must be divisible by rows_per_band "
            f"({rows_per_band}) — trailing signature rows would be silently "
            "dropped and recall would differ from the 1-(1-s^r)^b contract"
        )
    n_bands = n_hashes // rows_per_band
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)],
                    )
                ).alias("band_val"),
            )
            for b in range(n_bands)
        ]
    )
    return sigs.select(id_col, F.explode(bands).alias("band")).select(
        id_col, F.col("band.band_id").alias("band_id"), F.col("band.band_val").alias("band_val")
    )


def minhash_candidate_pairs(
    docs: DataFrame,
    n_hashes: int = 16,
    rows_per_band: int = 2,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH candidate pairs: documents colliding in at least one band.

    With b bands of r rows, a pair of true Jaccard s collides with
    probability 1-(1-s^r)^b (r=2,b=8: s=0.8 -> 0.9997, s=0.3 -> 0.53).
    The join key (band_id, band_val) is uniformly distributed md5 output,
    so the shuffle has no skew; at 100 TB this is the only stage that
    touches all pairs-ish data and it's an equi-join, not a cross join.
    """
    keys = minhash_band_keys(
        minhash_signatures(docs, n_hashes, k, text_col, id_col),
        n_hashes,
        rows_per_band,
        id_col,
    )
    a = keys.select(F.col(id_col).alias("doc_a"), "band_id", "band_val")
    b = keys.select(F.col(id_col).alias("doc_b"), "band_id", "band_val")
    return (
        a.join(b, ["band_id", "band_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates()
    )


def lsh_verified_pairs(
    docs: DataFrame,
    n_hashes: int = 16,
    rows_per_band: int = 2,
    k: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Two-stage near-duplicate detection — the complete 100 TB dedup
    pipeline as one operator:

    - stage 1 (candidate generation): MinHash-LSH band equi-join
      (minhash_candidate_pairs) — every document is touched once per
      band, join keys are uniform md5 values, no skew, no all-pairs;
    - stage 2 (verification): exact k-shingle Jaccard computed ONLY for
      candidate pairs, by joining the candidate list to each side's
      shingle rows. The intersect join is |candidates| x avg-shingles
      rows — LINEAR in the candidate count, never the full shingle
      self-join (and therefore immune to hot-shingle f^2 blowup without
      needing a df cap).

    A pair must pass BOTH gates: collide in >=1 band AND true
    Jaccard >= threshold. Output (doc_a, doc_b, jaccard). Contrast
    jaccard_pairs — identical verification arithmetic, exhaustive
    candidate source; LSH recall (1-(1-s^r)^b, r=2 b=8: 0.9997 at
    s=0.8) is the only difference, and the oracle replicates the exact
    same two stages so the result hash-matches anyway."""
    cand = tracked_persist(
        minhash_candidate_pairs(docs, n_hashes, rows_per_band, k, text_col, id_col)
    )
    return verify_pairs_exact(docs, cand, k, threshold, text_col, id_col)


def verify_pairs_exact(
    docs: DataFrame,
    cand: DataFrame,
    k: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_arrays: DataFrame | None = None,
) -> DataFrame:
    """Exact k-shingle Jaccard for a (doc_a, doc_b) candidate list — the
    shared verification stage behind every candidate generator (LSH
    bands, prefix filtering, ...).

    Verification joins per-doc shingle ARRAYS, not exploded rows: the
    (tiny, size-guarded broadcast) candidate list hits the doc->array
    table twice and the Jaccard is size(array_intersect) row-wise. No
    candidate x shingle fan-out ever materializes, and the array table
    never shuffles — measured 10.9 s -> ~3.3 s at sf0.1 vs the
    exploded-row join cascade. word_shingles is already distinct, so
    |intersect| / (|a| + |b| - |intersect|) is exact set Jaccard —
    identical arithmetic to the oracle's row-join formulation.

    ``shingle_arrays`` (r10): a caller that already materialized the
    (id_col, sh) shingle-array frame (prefix_filter_pairs persists it
    for its candidate stage) passes it here, saving a SECOND full
    tokenize+shingle pass over the corpus — at 100 TB that is one fewer
    full-corpus map stage; the frame must hold the same distinct
    k-shingles word_shingles produces."""
    arr = shingle_arrays
    if arr is None:
        arr = (
            fan_out(docs)
            .select(id_col, F.col(text_col).alias("__t"))
            .withColumn("__tok", tokens("__t"))
            .select(id_col, word_shingles("__tok", k).alias("sh"))
        )
    pa = arr.select(F.col(id_col).alias("doc_a"), F.col("sh").alias("sh_a"))
    pb = arr.select(F.col(id_col).alias("doc_b"), F.col("sh").alias("sh_b"))
    # candidate count is bounded by the generator's collision volume;
    # guard anyway so a pathological corpus falls back to shuffle
    # equi-joins instead of a driver-OOM broadcast
    small = cand.count() <= 2_000_000
    step1 = pa.join(F.broadcast(cand) if small else cand, "doc_a")
    step2 = pb.join(F.broadcast(step1) if small else step1, "doc_b")
    n_inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        step2.select(
            "doc_a",
            "doc_b",
            (
                n_inter.cast("double")
                / (F.size("sh_a") + F.size("sh_b") - n_inter)
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def prefix_filter_pairs(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT set-similarity join via prefix filtering (the PPJoin family,
    Chaudhuri et al. 2006 / Xiao et al. 2008) — the deterministic
    alternative to LSH candidates: every pair with true Jaccard >=
    ``threshold`` is guaranteed generated (no probabilistic recall), yet
    the candidate join never touches the full shingle inventory.

    The filter theorem: order every document's shingles by a GLOBAL
    ordering (here: ascending document frequency, rarest first, shingle
    string tie-break); two sets with Jaccard >= t must share at least one
    shingle among each side's first L = n - ceil(t*n) + 1 shingles. So
    the candidate join runs on PREFIX rows only — and because prefixes
    are by construction the RAREST shingles, the equi-join is skew-free
    precisely where the naive shingle self-join is hottest (the
    boilerplate shingle shared by 10^6 docs sits at the END of every
    prefix order and never joins).

    Verification is the shared exact-Jaccard stage (verify_pairs_exact),
    so output = jaccard_pairs(threshold) exactly — equality-tested, and
    the oracle replicates the naive formulation.

    Shuffles: one df groupBy (vocabulary-sized), one join back on the
    shingle, one per-doc rank window, the prefix equi-join, then
    verification (which reuses this operator's cached shingle arrays —
    no second corpus tokenize). Each moves prefix-sized rows, never the
    f^2 hot-shingle blowup."""
    # Persist the shingle ARRAY frame, not exploded rows (r10): the
    # tokenize+k-shingle transform — the dominant per-row cost — runs
    # ONCE; the exploded views below re-derive from the cached arrays
    # (explode of a stored column, no recompute), n_sh is size(array)
    # (word_shingles is array_distinct by construction, so size ==
    # exploded per-doc row count) instead of the second window pass the
    # old shape paid (count(*) OVER (PARTITION BY doc) — a full extra
    # sort+scan of the shingle rows after the df join), and the SAME
    # cached arrays feed verification, dropping verify_pairs_exact's own
    # second full-corpus tokenize pass (guide §1.2/§2.4: one evaluation,
    # shared). NOTE the size/explode projections must read a MATERIALIZED
    # array column: projecting size(expr)+explode(expr) straight off the
    # transform lets CollapseProject inline the shingle expression into
    # both consumers and the corpus pays it twice (measured 0.45 -> 2.8 s
    # on the explode stage before this persist boundary was added).
    arr = tracked_persist(
        fan_out(docs)
        .select(id_col, F.col(text_col).alias("__t"))
        .withColumn("__tok", tokens("__t"))
        .select(F.col(id_col).alias("doc"), word_shingles("__tok", k).alias("sh"))
    )
    sh = arr.select(
        "doc", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle")
    )
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    sized = sh.join(dfreq, "shingle")
    w = Window.partitionBy("doc").orderBy(F.asc("df"), F.asc("shingle"))
    ranked = sized.withColumn("rn", F.row_number().over(w))
    prefix_len = F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
    prefix = ranked.where(F.col("rn") <= prefix_len).select(
        "doc", "shingle", "n_sh"
    )
    a = prefix.select(
        F.col("doc").alias("doc_a"), "shingle", F.col("n_sh").alias("n_a")
    )
    b = prefix.select(
        F.col("doc").alias("doc_b"), "shingle", F.col("n_sh").alias("n_b")
    )
    # length filter (the second PPJoin prune): J(A,B) >= t forces
    # t*|A| <= |B| and t*|B| <= |A| — applied INSIDE the join so
    # mismatched-size pairs never reach verification (cut candidates
    # 118k -> 27k on the sf0.1 fixture)
    cand = (
        a.join(b, "shingle")
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col("n_b") >= F.ceil(F.lit(threshold) * F.col("n_a")))
            & (F.col("n_a") >= F.ceil(F.lit(threshold) * F.col("n_b")))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    cand = tracked_persist(cand)
    return verify_pairs_exact(
        docs,
        cand,
        k,
        threshold,
        text_col,
        id_col,
        shingle_arrays=arr.select(F.col("doc").alias(id_col), "sh"),
    )


def simhash32(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """32-bit SimHash over distinct tokens, md5-bit-sampled.

    Bit i of a token's hash = bit (i % 4) of hex digit (i / 4) of
    md5(token). The document's bit i is the sign of the vote sum over its
    distinct tokens. Engine-portable (md5 + integer ops only) and
    map-only up to the final per-doc aggregation.
    """
    tok = (
        fan_out(docs).select(id_col, F.col(text_col).alias("__t"))
        .select(id_col, F.explode(F.array_distinct(tokens("__t"))).alias("token"))
        .withColumn("__h", F.md5("token"))
    )
    # hoist the 8 hex digits (d_j = value of md5 char j+1) into one
    # projection so the 32 vote aggregates reference plain int columns —
    # keeps the aggregate expression tree (and its codegen) 4x smaller
    digits = tok.select(
        id_col,
        *[
            F.conv(F.substring("__h", j + 1, 1), 16, 10).cast("int").alias(f"__d{j}")
            for j in range(8)
        ],
    )
    votes = [
        F.sum(
            F.when(F.col(f"__d{i // 4}").bitwiseAND(F.lit(1 << (i % 4))) > 0, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(32)
    ]
    voted = digits.groupBy(id_col).agg(*votes)
    sim = None
    for i in range(32):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1 << i).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        sim = bit if sim is None else sim + bit
    return voted.select(id_col, sim.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash near-dup pairs: hamming distance <= max_hamming.

    Two scale paths, both equi-joins (never a cross join), picked by the
    distance bound:

    - ``max_hamming <= 1``: deleted-neighborhood join. Each doc emits its
      simhash plus all 32 one-bit flips as join keys; a pair within
      distance 1 meets on at least one key, and a pair further apart meets
      on none — the candidate set IS the true pair set, so no post-filter
      work is wasted. 33 keys/doc of 2^32-cardinality values.
    - larger bounds: pigeonhole chunking. Split the hash into
      ``max_hamming + 1`` chunks; a qualifying pair matches at least one
      chunk exactly, so candidates come from equi-joins on
      (chunk_id, chunk_value), then exact hamming (bit_count of xor)
      filters. Candidate volume grows as chunks narrow — the h<=1
      neighborhood path exists precisely because corpora with big
      near-identical clusters explode the chunk join.
    """
    sims = simhash32(docs, text_col, id_col)
    if max_hamming <= 1:
        keys = [F.col("simhash")]
        if max_hamming == 1:
            keys += [
                F.col("simhash").bitwiseXOR(F.lit(1 << i).cast("bigint"))
                for i in range(32)
            ]
        a = sims.select(
            F.col(id_col).alias("doc_a"),
            F.col("simhash").alias("sim_a"),
            F.explode(F.array(*keys)).alias("key"),
        )
        b = sims.select(
            F.col(id_col).alias("doc_b"), F.col("simhash").alias("sim_b")
        )
        return (
            a.join(b, a.key == b.sim_b)
            .where(F.col("doc_a") < F.col("doc_b"))
            .select(
                "doc_a",
                "doc_b",
                F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"),
            )
            .where(F.col("hamming") <= max_hamming)
            .dropDuplicates()
        )
    n_chunks = max_hamming + 1
    chunk_bits = 32 // n_chunks
    mask = (1 << chunk_bits) - 1
    chunks = sims.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.shiftright("simhash", c * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk_val"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("ch"),
    ).select(id_col, "simhash", F.col("ch.chunk_id").alias("chunk_id"), F.col("ch.chunk_val").alias("chunk_val"))
    a = chunks.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("sim_a"), "chunk_id", "chunk_val"
    )
    b = chunks.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("sim_b"), "chunk_id", "chunk_val"
    )
    return (
        a.join(b, ["chunk_id", "chunk_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates()
    )


def minhash_jaccard_estimates(
    docs: DataFrame,
    n_hashes: int = 16,
    rows_per_band: int = 2,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Estimator-quality observability for the MinHash family: per LSH
    candidate pair, the MinHash Jaccard ESTIMATE (matching signature
    components / n_hashes — the Broder 1997 unbiased estimator), the
    EXACT shingle Jaccard, and the absolute error. This is the report a
    100 TB dedup run uses to choose n_hashes and the verify threshold:
    estimate-vs-truth on the pairs the banding actually surfaces.

    Everything is md5-determined and rational (match counts over
    n_hashes, exact set Jaccard), so the whole report hash-matches the
    relational oracle. Shape: the signature table is computed ONCE
    (persisted) and feeds banding, both estimate sides, and nothing
    else corpus-sized; the exact stage is the shared broadcast
    array-intersect verifier."""
    sigs = tracked_persist(minhash_signatures(docs, n_hashes, k, text_col, id_col))
    keys = minhash_band_keys(sigs, n_hashes, rows_per_band, id_col)
    a = keys.select(F.col(id_col).alias("doc_a"), "band_id", "band_val")
    b = keys.select(F.col(id_col).alias("doc_b"), "band_id", "band_val")
    cand = tracked_persist(
        a.join(b, ["band_id", "band_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates()
    )
    sa = sigs.select(
        F.col(id_col).alias("doc_a"), *[F.col(f"h{j}").alias(f"__a{j}") for j in range(n_hashes)]
    )
    sb = sigs.select(
        F.col(id_col).alias("doc_b"), *[F.col(f"h{j}").alias(f"__b{j}") for j in range(n_hashes)]
    )
    n_match = None
    for j in range(n_hashes):
        m = F.when(F.col(f"__a{j}") == F.col(f"__b{j}"), 1).otherwise(0)
        n_match = m if n_match is None else (n_match + m)
    est = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (n_match.cast("double") / F.lit(float(n_hashes))).alias("est_jaccard"),
        )
    )
    exact = verify_pairs_exact(docs, cand, k, threshold=0.0, text_col=text_col, id_col=id_col)
    return est.join(exact, ["doc_a", "doc_b"]).select(
        "doc_a",
        "doc_b",
        "est_jaccard",
        F.col("jaccard").alias("exact_jaccard"),
        F.abs(F.col("est_jaccard") - F.col("jaccard")).alias("abs_err"),
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    min_sim: float = 0.3,
    top_n: int = 100,
    max_df_frac: float = 0.05,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sparse-vector similarity join via an INVERTED INDEX: top document
    pairs by tf-idf cosine — the third candidate-generation geometry
    next to LSH banding (probabilistic) and prefix filtering (exact set
    overlap). Weighted-term cosine is what near-dup verification at the
    paragraph level and citation/plagiarism detection actually rank by.

    Scale anatomy (the inverted-index join is Σ_term df² — identical
    skew law to the shingle join):
    - ``max_df_frac`` drops terms with df > frac*N BEFORE the postings
      self-join. The default 5% cap is deliberately TIGHT: it is the
      pairing stage's cost ceiling (Σ df² ≤ |vocab|·cap²), and rare
      terms are precisely the discriminative ones — the same insight
      that makes PPJoin prefixes rarest-first. Terms above the cap are
      idf-damped anyway; measured at sf0.1 the 20%→5% cap cut the pair
      stream ~10x with the same top pairs. The cap is a FRACTION, so
      the cost profile is scale-invariant;
    - postings are (term, doc, w) rows; the per-term self-join output is
      bounded by the capped df², and the pair dot-product is ONE
      partial-aggregated groupBy(doc_a, doc_b);
    - norms are a doc-keyed aggregate joined back by id (shuffle join —
      the pair table is candidate-sized, AQE broadcasts it when small).

    Exactness: idf = ln(N/df) evaluates once per term identically in
    both engines; every summation (norms, dots) accumulates
    DECIMAL(28,12)-cast per-term products, so sums are order-independent
    and the report hash-matches the relational oracle."""
    n_docs = docs.count()
    cap = int(max_df_frac * n_docs)
    tok = (
        fan_out(docs)
        .select(id_col, F.explode(tokens(F.lower(F.col(text_col)))).alias("term"))
        .where(F.col("term") != "")
    )
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("__tf"))
    dfreq = (
        tf.groupBy("term")
        .agg(F.count("*").alias("__df"))
        .where(F.col("__df") <= cap)
    )
    w = tracked_persist(
        tf.join(dfreq, "term").select(
            F.col(id_col).alias("doc"),
            "term",
            (
                F.col("__tf")
                * F.log(F.lit(float(n_docs)) / F.col("__df"))
            ).alias("w"),
        )
    )
    norms = w.groupBy("doc").agg(
        F.sqrt(
            F.sum((F.col("w") * F.col("w")).cast("decimal(28,12)")).cast("double")
        ).alias("norm")
    )
    pa = w.select("term", F.col("doc").alias("doc_a"), F.col("w").alias("__wa"))
    pb = w.select("term", F.col("doc").alias("doc_b"), F.col("w").alias("__wb"))
    dots = (
        pa.join(pb, "term")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum((F.col("__wa") * F.col("__wb")).cast("decimal(28,12)"))
            .cast("double")
            .alias("__dot")
        )
    )
    na = norms.select(F.col("doc").alias("doc_a"), F.col("norm").alias("__na"))
    nb = norms.select(F.col("doc").alias("doc_b"), F.col("norm").alias("__nb"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("__dot") / (F.col("__na") * F.col("__nb"))).alias("cosine"),
        )
        .where(F.col("cosine") >= min_sim)
        .orderBy(F.desc("cosine"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(top_n)
    )


def dedup_signal_consensus(
    docs: DataFrame,
    embeddings: DataFrame,
    text_threshold: float = 0.8,
    cos_threshold: float = 0.35,
) -> DataFrame:
    """Multi-signal dedup consensus: full outer join of the TEXT
    near-dup pairs (LSH-verified shingle Jaccard >= text_threshold) and
    the EMBEDDING near-dup pairs (bucketed cosine >= cos_threshold),
    assuming the fixture's doc_id == vec_id alignment. Output
    (doc_a, doc_b, text_jaccard, in_text, in_embedding).

    This is the disagreement report a 100 TB dedup run reads before
    trusting either signal alone: in_text-only rows are surface dups an
    embedding missed (paraphrase-ish encoder), in_embedding-only rows
    are semantic dups exact text methods cannot see (SemDeDup's whole
    reason to exist). Both inputs are the already-plan-audited
    operators; the fusion adds one full outer join of two
    candidate-sized frames."""
    from pipeline_pyspark_etl_imdb_spark.operators.similarity import (
        cosine_dup_pairs,
    )

    tp = lsh_verified_pairs(docs, threshold=text_threshold).withColumn(
        "__txt", F.lit(True)
    )
    ep = cosine_dup_pairs(embeddings, threshold=cos_threshold).withColumn(
        "__emb", F.lit(True)
    )
    return (
        tp.join(ep, ["doc_a", "doc_b"], "full_outer")
        .select(
            "doc_a",
            "doc_b",
            F.col("jaccard").alias("text_jaccard"),
            F.coalesce(F.col("__txt"), F.lit(False)).alias("in_text"),
            F.coalesce(F.col("__emb"), F.lit(False)).alias("in_embedding"),
        )
        .orderBy("doc_a", "doc_b")
    )


def _containment_rarest(
    base: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared head of the containment-dedup pipeline: returns
    ``(toks, postings, rarest)`` where ``rarest`` is one row per
    eligible inner doc (>= 5 tokens) carrying its globally rarest
    interior 3-shingle and that shingle's document frequency.

    toks feeds postings AND the interior-shingle frame; postings feeds
    the df aggregate AND (in containment_pairs) the candidate equi-join
    — both are ``tracked_persist``ed so the tokenize/3-shingle explode
    (the dominant cost) runs once per action, not twice (the r3
    cached-shingles discipline). The base fans out first (the
    shingle_sets discipline): tokenize+shingle multiplies rows ~50x and
    is CPU-bound, so a single-file scan must not serialize it."""
    toks = tracked_persist(
        fan_out(base).select(
            "doc_id", tokens(F.col("text")).alias("toks")
        ).withColumn("n_toks", F.size("toks"))
    )
    postings = tracked_persist(
        toks.select("doc_id", F.explode(word_shingles("toks", 3)).alias("shingle"))
    )
    df_counts = postings.groupBy("shingle").agg(F.count("*").alias("df"))
    interior = (
        toks.where(F.col("n_toks") >= 5)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "array_distinct(transform(sequence(1, n_toks - 4), "
                    "s -> concat_ws(' ', slice(toks, s + 1, 3))))"
                )
            ).alias("shingle"),
        )
    )
    rarest = (
        interior.join(df_counts, "shingle")
        .groupBy("doc_id")
        .agg(F.min(F.struct("df", "shingle")).alias("m"))
        .select(
            "doc_id", F.col("m.shingle").alias("shingle"), F.col("m.df").alias("df")
        )
    )
    return toks, postings, rarest


def containment_df_profile(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Scale observability for :func:`containment_pairs` (ADVICE r5).

    The complete (``df_frac_cap=None``) containment form's candidate
    fan-out is EXACTLY ``sum over inner docs of df(rarest interior
    shingle)`` — near-linear on natural corpora, quadratic on
    boilerplate-heavy ones where every interior shingle is ubiquitous.
    This one-row report makes that regime observable BEFORE it bites:

    - ``candidate_rows`` — the exact pre-verify join fan-out (it counts
      each inner doc's own posting, i.e. overcounts the post-self-filter
      candidate set by exactly ``n_inner_docs``);
    - ``max_df`` — the hottest rarest-shingle df (the skew ceiling of
      the candidate equi-join);
    - ``docs_over_1pct`` / ``docs_over_10pct`` — inner docs whose rarest
      interior shingle appears in > 1% / > 10% of ALL docs (integer-
      exact: ``df * 100 > n_docs`` / ``df * 10 > n_docs``) — exactly the
      docs a ``df_frac_cap`` at that threshold would route to the
      LSH/Jaccard path.

    Everything is BIGINT arithmetic over the same toks/postings chain
    the dedup itself runs — no float anywhere, so the oracle matches
    bit-for-bit. One extra aggregate over the doc-count-sized rarest
    frame; no new shuffle class at 100 TB."""
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    _toks, _postings, rarest = _containment_rarest(base)
    n_docs = base.agg(F.count("*").cast("bigint").alias("__n"))
    return (
        rarest.crossJoin(F.broadcast(n_docs))
        .agg(
            F.max("__n").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_inner_docs"),
            F.sum("df").cast("bigint").alias("candidate_rows"),
            F.max("df").cast("bigint").alias("max_df"),
            F.count_if(F.col("df") * 100 > F.col("__n"))
            .cast("bigint")
            .alias("docs_over_1pct"),
            F.count_if(F.col("df") * 10 > F.col("__n"))
            .cast("bigint")
            .alias("docs_over_10pct"),
        )
    )


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_frac_cap: float | None = None,
) -> DataFrame:
    """EXACT substring-containment dedup (the RefinedWeb/CCNet "document
    swallowed by another document" case exact-match dedup misses and
    Jaccard under-scores: a short doc fully inside a long one has tiny
    Jaccard but is 100% redundant).

    Semantics: every ordered pair (inner, outer) where inner's text with
    >= 5 whitespace tokens occurs verbatim (character-level) inside a
    DIFFERENT doc's text.

    The naive form is an all-pairs instr() join — never acceptable. The
    scale path rests on a token-alignment lemma: if inner.text occurs at
    char level inside outer.text, the spaces inside the match are spaces
    of outer, so every inner token EXCEPT possibly the first and last
    (which can fuse with adjacent non-space chars of outer) appears as a
    whole token of outer, in order. Hence every 3-shingle drawn from
    inner's INTERIOR tokens (positions 1..n-2) is guaranteed present in
    outer's full 3-shingle set — which is why inner docs need >= 5
    tokens (n-4 >= 1 interior shingles) and why the candidate join on
    ONE interior shingle per inner doc is complete, not heuristic.

    Picking the globally RAREST interior shingle (min document frequency,
    shingle tie-break — a partial-aggregated struct-min, the PPJoin
    rarest-first discipline above) keeps that equi-join skew-free: the
    boilerplate shingle every doc shares is by definition never anyone's
    rarest. Shuffles: shingle df groupBy, df join-back, per-doc struct-
    min, the candidate equi-join, two id-joins to fetch texts for the
    instr() verify — every stage moves doc-count- or candidate-sized
    rows, never an all-pairs product.

    Candidate budget: the fan-out is EXACTLY sum over inner docs of
    df(their rarest interior shingle). On natural corpora that is near-
    linear; the degenerate case is a boilerplate-heavy corpus where some
    docs' ENTIRE interior is ubiquitous shingles — their rarest shingle
    is still hot, and candidates go quadratic while the true output
    stays small. ``df_frac_cap`` is the honest escape hatch: when set,
    inner docs whose rarest interior shingle appears in more than
    ``df_frac_cap`` of all docs are EXCLUDED from the inner side (they
    are exactly the docs this algorithm cannot bound; route them to the
    LSH/Jaccard path instead). Default None keeps the result complete —
    the registry query and oracle use the complete form."""
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    pairs, _postings = _containment_pairs_and_postings(base, df_frac_cap)
    return pairs


def _containment_pairs_and_postings(
    base: DataFrame, df_frac_cap: float | None = None
) -> tuple[DataFrame, DataFrame]:
    """containment_pairs body over a normalized (doc_id, text) frame,
    also returning the persisted per-doc distinct 3-shingle postings so
    composite callers (dedup_cascade) can reuse them without a second
    corpus tokenize+explode."""
    toks, postings, rarest = _containment_rarest(base)
    if df_frac_cap is not None:
        # in-plan corpus count (1-row broadcast) — no driver action
        n_docs = base.agg(F.count("*").cast("double").alias("__n"))
        rarest = (
            rarest.crossJoin(F.broadcast(n_docs))
            .where(F.col("df").cast("double") <= F.lit(float(df_frac_cap)) * F.col("__n"))
            .select("doc_id", "shingle", "df")
        )
    rarest = rarest.drop("df")
    candidates = (
        rarest.withColumnRenamed("doc_id", "inner_doc")
        .join(
            postings.withColumnRenamed("doc_id", "outer_doc"), "shingle"
        )
        .where(F.col("inner_doc") != F.col("outer_doc"))
        .select("inner_doc", "outer_doc")
    )
    verified = (
        candidates.join(
            base.select(
                F.col("doc_id").alias("inner_doc"), F.col("text").alias("__in_t")
            ),
            "inner_doc",
        )
        .join(
            base.select(
                F.col("doc_id").alias("outer_doc"), F.col("text").alias("__out_t")
            ),
            "outer_doc",
        )
        .where(F.instr(F.col("__out_t"), F.col("__in_t")) > 0)
    )
    pairs = verified.select(
        "inner_doc",
        "outer_doc",
        F.length("__in_t").cast("bigint").alias("inner_chars"),
        F.length("__out_t").cast("bigint").alias("outer_chars"),
    ).orderBy("inner_doc", "outer_doc")
    return pairs, postings


def dedup_cascade(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Stage-ordered dedup SURVIVORSHIP — the composite an actual
    training-data pipeline runs, with per-document attribution:

    1. **exact**: md5-free full-text grouping; the minimum id per
       identical-text group survives, the rest drop with
       ``stage='exact'`` and the group canonical as ``canonical_id``.
    2. **contained**: among exact survivors, every doc (>= 5 tokens)
       whose text occurs verbatim inside a DIFFERENT survivor drops with
       ``stage='contained'`` and the minimum containing doc as canonical.
       Containment is transitive, so dropping against ALL survivors (not
       just un-contained ones) is sound: if a < b < c, a's witness chain
       ends in a kept container.
    3. **near**: among the remaining docs, exact k-shingle Jaccard >=
       ``threshold`` pairs (complete by the shared-shingle join — any
       positive-Jaccard pair shares a shingle; df-capped per the
       boilerplate guard) form components; the minimum id per component
       survives, the rest drop with ``stage='near'``.
    4. everything else: ``keep=true, stage='kept', canonical_id=doc_id``.

    Output: exactly one row per input doc — (doc_id, keep, stage,
    canonical_id), ordered by doc_id. Every stage reuses the engine's
    bucketed primitives (exact groupBy, rarest-interior-shingle
    containment join, shingle-postings Jaccard, min-label components),
    so the cascade inherits their no-all-pairs 100 TB posture; the
    stages run on strictly shrinking survivor frames."""
    from pipeline_pyspark_etl_imdb_spark.operators.components import (
        connected_components,
    )

    base = tracked_persist(
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("text"),
            F.md5(F.col(text_col)).alias("__h"),
        )
    )
    # exact grouping keys on md5(text), the exact_dup_groups discipline:
    # the group shuffle and the join back move a 32-char digest, not the
    # document body — at 100 TB the full-text key would ship the corpus
    # through BOTH exchanges
    groups = base.groupBy("__h").agg(F.min("doc_id").alias("exact_canonical"))
    s1 = tracked_persist(base.join(groups, "__h").drop("__h"))
    surv1 = tracked_persist(
        s1.where(F.col("doc_id") == F.col("exact_canonical")).select(
            "doc_id", "text"
        )
    )
    pairs, postings = _containment_pairs_and_postings(surv1)
    contained = tracked_persist(
        pairs.groupBy("inner_doc").agg(F.min("outer_doc").alias("container"))
    )
    surv2 = tracked_persist(
        surv1.join(
            contained, surv1["doc_id"] == contained["inner_doc"], "left_anti"
        )
    )
    # stage 3 reuses stage 2's PERSISTED per-doc distinct 3-shingle
    # postings (identical shingle definition) restricted to the stage-2
    # survivors — the corpus is tokenized/exploded once for both stages,
    # not twice (at 100 TB: one corpus scan saved per cascade run).
    # Note: postings are k=3 shingles; a non-default k falls back to a
    # fresh shingle pass.
    if k == 3:
        sh2 = postings.join(surv2.select("doc_id"), "doc_id", "left_semi")
        edges = jaccard_pairs_from_shingles(
            sh2, threshold=threshold, max_shingle_df=max_shingle_df
        ).select("doc_a", "doc_b")
    else:
        edges = jaccard_pairs(
            surv2, k=k, threshold=threshold, max_shingle_df=max_shingle_df
        ).select("doc_a", "doc_b")
    comp = tracked_persist(connected_components(edges))
    near_dropped = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id"), F.col("component").alias("canonical_id")
    )
    report = (
        s1.where(F.col("doc_id") != F.col("exact_canonical"))
        .select(
            "doc_id",
            F.lit(False).alias("keep"),
            F.lit("exact").alias("stage"),
            F.col("exact_canonical").alias("canonical_id"),
        )
        .unionByName(
            contained.select(
                F.col("inner_doc").alias("doc_id"),
                F.lit(False).alias("keep"),
                F.lit("contained").alias("stage"),
                F.col("container").alias("canonical_id"),
            )
        )
        .unionByName(
            near_dropped.select(
                "doc_id",
                F.lit(False).alias("keep"),
                F.lit("near").alias("stage"),
                "canonical_id",
            )
        )
        .unionByName(
            surv2.join(
                near_dropped.select("doc_id"), "doc_id", "left_anti"
            ).select(
                "doc_id",
                F.lit(True).alias("keep"),
                F.lit("kept").alias("stage"),
                F.col("doc_id").alias("canonical_id"),
            )
        )
    )
    return report.orderBy("doc_id")
