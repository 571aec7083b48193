"""Embedding similarity search over an array<float> column.

Two paths, mirroring production ANN architecture:

- ``cosine_knn``: exact brute force — broadcast the (small) query set,
  score map-side against the full corpus, per-query top-k via the
  group-limit window. The right baseline and the verifier for ANN recall.
  Cost is O(|corpus| x |queries|) map work with NO shuffle of the corpus:
  at 100 TB this is how you batch-score a bounded query set.

- ``lsh_bucket`` / ``ann_lsh_knn``: random-hyperplane LSH. Plane
  directions are pseudo-random signs derived from md5 (engine-portable,
  no RNG state); dot products against planes accumulate in DECIMAL, so
  bucket assignment is EXACT — the same document lands in the same bucket
  on any engine, which makes the ANN path itself oracle-checkable.
  Candidates come from an equi-join on the bucket id (uniform md5-derived
  keys -> no skew), then exact cosine ranks within the bucket.

Scoring arithmetic: floats widen to double (exact); only the final cosine
uses float summation. Output columns are (query_id, neighbor_id, rank) —
ranks are stable because real-world score gaps dwarf last-ulp
accumulation differences; scores themselves stay out of hashed output.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.topk import top_k_per_group
from pipeline_pyspark_etl_imdb_spark.operators.util import fan_out, tracked_persist


def scaled_n_planes(
    n: int, target_bucket_rows: int = 128, floor: int = 4, cap: int = 32
) -> int:
    """Hyperplane count that keeps EXPECTED bucket occupancy at or below
    ``target_bucket_rows``: p = clamp(ceil(log2(n / target)), floor, cap).

    A fixed plane count is a scale bug: per-bucket candidate joins are
    O(occupancy^2) and occupancy = n / 2^p, so constant p makes the join
    quadratic in n. Growing p with log2(n) keeps occupancy — and therefore
    per-bucket work — bounded as the corpus grows (n=1e9 -> 23 planes,
    ~120 rows/bucket). At the fixture scales (n<=5e3 with the default
    target) this evaluates to the floor of 4, which the hand-expanded
    4-plane SQL oracle mirrors."""
    if n <= 0:
        return floor
    return max(floor, min(cap, math.ceil(math.log2(max(n / target_bucket_rows, 1.0)))))


def scaled_n_centroids(n: int, floor: int = 16, cap: int = 65536) -> int:
    """IVF centroid count ~ sqrt(n/2), clamped. Fixed centroid counts don't
    survive scale-up: with c centroids and p probes a query scans p*n/c
    vectors, so c must grow with n; c ~ sqrt(n) balances the coarse search
    (c comparisons) against the fine search (p*n/c). n=500 -> 16 (fixture
    value, mirrored by the oracle's formula), n=1e9 -> 22361."""
    return max(floor, min(cap, math.ceil(math.sqrt(max(n, 1) / 2.0))))


def _uniform32(col: Column) -> Column:
    """Deterministic uniform 32-bit integer from md5 of the value's string
    form — engine-portable (the DuckDB oracle parses the same hex)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _norm(vec: Column) -> Column:
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_knn(
    embeddings: DataFrame,
    k: int = 10,
    query_ids: Sequence[int] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (self excluded)."""
    # per-(corpus row x query) scoring is CPU-bound; don't let a single-file
    # scan serialize it
    embeddings = fan_out(embeddings)
    base = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("n", _norm(F.col("v")))
    q = base
    if query_ids is not None:
        q = base.where(F.col(id_col).isin(list(query_ids)))
    q = q.select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"), F.col("n").alias("qn")
    )
    corpus = base.select(
        F.col(id_col).alias("neighbor_id"), F.col("v").alias("nv"), F.col("n").alias("nn")
    )
    # force-broadcast only a bounded query set; with query_ids=None the
    # "queries" are the whole corpus and broadcasting it would OOM — let
    # Catalyst pick the strategy for the all-pairs case
    q_side = F.broadcast(q) if query_ids is not None else q
    scored = (
        corpus.join(q_side, F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", _dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")))
    )
    ranked = top_k_per_group(
        scored, ["query_id"], [F.desc("cos"), F.asc("neighbor_id")], k
    )
    return ranked.select("query_id", "neighbor_id", F.col("rk").cast("int").alias("rk"))


def hyperplane_signs(spark: SparkSession, n_planes: int, dim: int) -> DataFrame:
    """(j, i, sign) rows: sign of plane j at coordinate i, derived from the
    first hex digit of md5('j:i') — deterministic on every engine."""
    return (
        spark.range(n_planes)
        .select(F.col("id").cast("int").alias("j"))
        .select("j", F.explode(F.sequence(F.lit(0), F.lit(dim - 1))).alias("i"))
        .withColumn(
            "sign",
            F.when(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("j").cast("string"), F.lit(":"), F.col("i").cast("string")
                            )
                        ),
                        1,
                        1,
                    ),
                    16,
                    10,
                ).cast("int")
                >= 8,
                F.lit(1),
            ).otherwise(F.lit(-1)),
        )
    )


def lsh_bucket(
    embeddings: DataFrame,
    n_planes: int | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket) — sign-pattern bucket of each vector across the planes.

    Dot products accumulate in DECIMAL(18,9) (exact, order-independent),
    so the sign — hence the bucket — is engine-exact even though the
    embeddings are floats.

    ``n_planes=None`` (default) scales the plane count with corpus size
    (``scaled_n_planes``) so bucket occupancy — and the O(occupancy^2)
    candidate join downstream — stays bounded at 100x the data.
    """
    spark = embeddings.sparkSession
    if n_planes is None:
        # one column-pruned count job; at scale this reads parquet footers
        n_planes = scaled_n_planes(embeddings.select(id_col).count())
    embeddings = fan_out(embeddings)
    ex = embeddings.select(
        F.col(id_col), F.posexplode(F.col(vec_col)).alias("i", "x")
    ).withColumn("xd", F.col("x").cast("decimal(18,9)"))
    planes = hyperplane_signs(spark, n_planes, dim)
    dots = (
        ex.join(F.broadcast(planes), "i")
        .groupBy(id_col, "j")
        .agg(F.sum(F.col("sign") * F.col("xd")).alias("dot"))
    )
    bit_value = F.expr("CAST(shiftleft(1, CAST(j AS INT)) AS BIGINT)")
    bucketed = dots.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("dot") > 0, bit_value).otherwise(F.lit(0).cast("bigint"))
        ).alias("bucket")
    )
    # NULL/empty embeddings posexplode to zero rows and would silently
    # vanish from every downstream inner join (never reported as neighbor
    # OR near-dup); keep them addressable in a sentinel bucket instead
    all_ids = embeddings.select(F.col(id_col))
    return all_ids.join(bucketed, id_col, "left").select(
        id_col, F.coalesce(F.col("bucket"), F.lit(-1).cast("bigint")).alias("bucket")
    )


def ivf_index(
    embeddings: DataFrame,
    n_centroids: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer, deterministic flavor: centroids are actual
    corpus vectors picked by a hash-stride filter, each vector is assigned
    to its nearest centroid by cosine. Returns (centroids, assignments).

    Real IVF runs k-means; the hash-pick variant keeps the index fully
    reproducible (no RNG state, no iteration-order sensitivity) while
    exercising the same physical shape: a tiny broadcast centroid table,
    one map-side argmin pass over the corpus, and a cluster-id column to
    prune search.

    The pick is a MAP-ONLY filter — keep ids whose md5-derived uniform
    value is ``0 mod stride`` (stride = n // n_centroids) — so no global
    sort, no single-partition window, and nothing but the (~n_centroids)
    survivors ever leaves the executors. The selected count is binomial
    around n_centroids (P(empty) <= e^-16); IVF needs "about c centroids",
    not exactly c. ``n_centroids=None`` scales c ~ sqrt(n)
    (``scaled_n_centroids``).
    """
    embeddings = fan_out(embeddings)
    # the only driver-visible value is one scalar count (column-pruned:
    # parquet answers it from footer metadata)
    n = embeddings.select(F.col(id_col)).count()
    if n_centroids is None:
        n_centroids = scaled_n_centroids(n)
    stride = max(n // n_centroids, 1)
    centroids = (
        embeddings.where(_uniform32(F.col(id_col)) % stride == 0)
        .select(
            F.col(id_col).alias("centroid_id"),
            _as_double(F.col(vec_col)).alias("cv"),
        )
        .withColumn("cn", _norm(F.col("cv")))
    )
    base = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("n", _norm(F.col("v")))
    scored = base.join(F.broadcast(centroids), how="cross").withColumn(
        "cos", _dot(F.col("v"), F.col("cv")) / (F.col("n") * F.col("cn"))
    )
    # argmax as a PARTIAL AGGREGATE, not a rank window: min over an
    # orderable struct (-cos, centroid_id) map-side-combines each
    # partition's n*c scored rows down to its distinct ids before the
    # exchange, where the row_number window shuffles (group-limited but
    # still sorted) candidate rows. Same total order as
    # [desc cos, asc centroid_id] rank 1.
    assignments = (
        scored.groupBy(id_col)
        .agg(
            F.min(
                F.struct(
                    (-F.col("cos")).alias("nc"), F.col("centroid_id").alias("cid")
                )
            ).alias("__a")
        )
        .select(F.col(id_col), F.col("__a.cid").alias("centroid_id"))
    )
    return centroids.select("centroid_id", "cv", "cn"), assignments


def ann_ivf_knn(
    embeddings: DataFrame,
    k: int = 5,
    n_centroids: int | None = None,
    n_probe: int = 4,
    query_ids: Sequence[int] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via IVF: each query probes its ``n_probe`` nearest
    centroids and ranks exactly within those clusters only. The corpus
    shuffles once on centroid_id; queries broadcast with their probe list.
    Recall against brute force is gated in tests/test_similarity.py."""
    centroids, assignments = ivf_index(embeddings, n_centroids, id_col, vec_col)
    # both the query and corpus sides reference the index subtrees; persist
    # so the argmin pass over the corpus runs once per build, not per branch
    # (small tables: ~c and ~n*2 narrow rows; evicted by LRU when cold)
    centroids = tracked_persist(centroids)
    assignments = tracked_persist(assignments)
    base = (
        embeddings.join(assignments, id_col)
        .select(F.col(id_col), "centroid_id", _as_double(F.col(vec_col)).alias("v"))
        .withColumn("n", _norm(F.col("v")))
    )
    q = base
    if query_ids is not None:
        q = base.where(F.col(id_col).isin(list(query_ids)))
    q_scored = q.select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"), F.col("n").alias("qn")
    ).join(F.broadcast(centroids), how="cross").withColumn(
        "cos", _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    )
    probes = top_k_per_group(
        q_scored, ["query_id"], [F.desc("cos"), F.asc("centroid_id")], n_probe
    ).select("query_id", "centroid_id", "qv", "qn")
    corpus = base.select(
        F.col(id_col).alias("neighbor_id"), "centroid_id", F.col("v").alias("nv"), F.col("n").alias("nn")
    )
    # bounded only when the query set is bounded (same guard as the other
    # ANN paths: with query_ids=None probes cover the whole corpus)
    probe_side = F.broadcast(probes) if query_ids is not None else probes
    scored = (
        corpus.join(probe_side, "centroid_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", _dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")))
    )
    ranked = top_k_per_group(
        scored, ["query_id"], [F.desc("cos"), F.asc("neighbor_id")], k
    )
    return ranked.select("query_id", "neighbor_id", F.col("rk").cast("int").alias("rk"))


def cosine_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.99,
    n_planes: int | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: same LSH bucket AND exact
    cosine >= threshold.

    The dedup variant of ANN: near-identical vectors agree on every
    hyperplane sign with overwhelming probability, so bucketing loses
    almost no true dups while cutting the pair space from O(n^2) to
    per-bucket. The bucket equi-join is the only shuffle.
    """
    buckets = lsh_bucket(embeddings, n_planes, dim, id_col, vec_col)
    # persist: both join sides below read this subtree — without the
    # cache the hyperplane projection + norm evaluates TWICE per query
    # (measured 2x wall at sf0.1). MEMORY_AND_DISK spills gracefully at
    # corpus scale; same per-call amortization as ivf_index.
    base = (
        embeddings.join(buckets, id_col)
        .select(F.col(id_col), "bucket", _as_double(F.col(vec_col)).alias("v"))
        .withColumn("n", _norm(F.col("v")))
    )
    base = tracked_persist(base)
    a = base.select(
        F.col(id_col).alias("doc_a"), "bucket", F.col("v").alias("va"), F.col("n").alias("na")
    )
    b = base.select(
        F.col(id_col).alias("doc_b"),
        F.col("bucket").alias("bucket_b"),
        F.col("v").alias("vb"),
        F.col("n").alias("nb"),
    )
    return (
        a.join(b, (F.col("bucket") == F.col("bucket_b")) & (F.col("doc_a") < F.col("doc_b")))
        .withColumn("cos", _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .where(F.col("cos") >= threshold)
        .select("doc_a", "doc_b")
    )


def ann_lsh_knn(
    embeddings: DataFrame,
    k: int = 5,
    n_planes: int | None = None,
    dim: int = 64,
    query_ids: Sequence[int] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine rank restricted to the query's LSH
    bucket. The corpus shuffles once on the bucket id; queries broadcast."""
    buckets = lsh_bucket(embeddings, n_planes, dim, id_col, vec_col)
    # persist: both join sides below read this subtree — without the
    # cache the hyperplane projection + norm evaluates TWICE per query
    # (measured 2x wall at sf0.1). MEMORY_AND_DISK spills gracefully at
    # corpus scale; same per-call amortization as ivf_index.
    base = (
        embeddings.join(buckets, id_col)
        .select(F.col(id_col), "bucket", _as_double(F.col(vec_col)).alias("v"))
        .withColumn("n", _norm(F.col("v")))
    )
    base = tracked_persist(base)
    q = base
    if query_ids is not None:
        q = base.where(F.col(id_col).isin(list(query_ids)))
    q = q.select(
        F.col(id_col).alias("query_id"),
        F.col("bucket").alias("qb"),
        F.col("v").alias("qv"),
        F.col("n").alias("qn"),
    )
    corpus = base.select(
        F.col(id_col).alias("neighbor_id"), "bucket", F.col("v").alias("nv"), F.col("n").alias("nn")
    )
    # force-broadcast only a bounded query set; with query_ids=None the
    # "queries" are the whole corpus — let Catalyst pick (same guard as
    # cosine_knn)
    q_side = F.broadcast(q) if query_ids is not None else q
    scored = (
        corpus.join(
            q_side,
            (F.col("bucket") == F.col("qb")) & (F.col("neighbor_id") != F.col("query_id")),
        )
        .withColumn("cos", _dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")))
    )
    ranked = top_k_per_group(
        scored, ["query_id"], [F.desc("cos"), F.asc("neighbor_id")], k
    )
    return ranked.select(
        "query_id", F.col("bucket").cast("bigint").alias("bucket"), "neighbor_id", F.col("rk").cast("int").alias("rk")
    )


def scaled_pq_codes(n: int, floor: int = 16, cap: int = 256) -> int:
    """Per-subspace PQ codebook size ~ sqrt(n/2), clamped to [16, 256].
    256 is the classical PQ ceiling (codes fit one byte per subspace —
    the whole corpus index is m bytes/vector); below that the same
    sqrt growth as IVF balances codebook scan cost against cell
    occupancy. n=500 -> 16 (fixture value, mirrored by the oracle)."""
    return max(floor, min(cap, math.ceil(math.sqrt(max(n, 1) / 2.0))))


def _l2sq_dec(a: Column, b: Column) -> Column:
    """Squared L2 distance accumulated in DECIMAL — exact and
    order-independent, so code assignment and ADC ranking are engine-exact
    (same rationale as lsh_bucket's decimal dot products: float last-ulp
    differences must never decide an argmin that feeds hashed output).

    Types are deliberately narrow: components are unit-scale, so the
    scale-9 quantization is tie-free (no binary float sits exactly on a
    decimal-9 midpoint — the midpoint has a factor 5^-10 and is never
    dyadic), squares are exact at scale 18 within DECIMAL(23,18), and the
    running sum stays inside DECIMAL(25,18) (the merge cast is identity:
    sums are < 10^7). Wider types would trip Spark's precision-38 cap,
    which silently REDUCES scale on overflow and breaks cross-engine
    exactness."""
    sq = F.zip_with(
        a,
        b,
        lambda x, y: (x.cast("decimal(10,9)") - y.cast("decimal(10,9)"))
        * (x.cast("decimal(10,9)") - y.cast("decimal(10,9)")),
    )
    return F.aggregate(
        sq,
        F.lit(0).cast("decimal(25,18)"),
        lambda acc, x: (acc + x).cast("decimal(25,18)"),
    )


def pq_index(
    embeddings: DataFrame,
    m: int = 16,
    n_codes: int | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Product-quantization index, deterministic flavor: split each vector
    into ``m`` subvectors; the per-subspace codebook is the corresponding
    slice of hash-stride-picked corpus vectors (same pick rule as
    ``ivf_index`` — map-only filter, no RNG, no global sort); every
    subvector is assigned to its nearest codeword by squared L2.
    Returns (codewords, codes):

    - codewords: (s, code_id, cw) — subspace s's codebook, ~n_codes rows
      per subspace (broadcast-sized by construction).
    - codes: (id, s, code_id) — the corpus encoded at m
      log2(n_codes)-bit codes per vector. THIS is the 100 TB payoff:
      the search structure is m small ints per vector (vs m*dim floats),
      so re-ranking candidate sets touches ~1% of the raw bytes.

    Real PQ trains codebooks with k-means; the stride pick keeps the
    index reproducible on any engine (the DuckDB oracle re-derives it
    exactly) while exercising the same physical shape: broadcast
    codebooks, one map-side argmin pass, narrow code columns.
    """
    sub_len = dim // m
    embeddings = fan_out(embeddings)
    n = embeddings.select(F.col(id_col)).count()
    if n_codes is None:
        n_codes = scaled_pq_codes(n)
    stride = max(n // n_codes, 1)
    base = embeddings.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    anchors = base.where(_uniform32(F.col(id_col)) % stride == 0).select(
        F.col(id_col).alias("code_id"), "v"
    )
    subs = F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s")
    codewords = anchors.select("code_id", subs, "v").select(
        "s", "code_id", F.expr(f"slice(v, s*{sub_len}+1, {sub_len})").alias("cw")
    )
    corpus_sub = base.select(F.col(id_col), subs, "v").select(
        F.col(id_col), "s", F.expr(f"slice(v, s*{sub_len}+1, {sub_len})").alias("sv")
    )
    scored = corpus_sub.join(F.broadcast(codewords), "s").withColumn(
        "d2", _l2sq_dec(F.col("sv"), F.col("cw"))
    )
    # nearest codeword per (id, s) as a partial-aggregated min over the
    # orderable (d2, code_id) struct — the n*m*n_codes scored stream
    # collapses map-side to n*m rows before any exchange (the rank-window
    # form shuffled the group-limited candidates and sorted them)
    codes = (
        scored.groupBy(id_col, "s")
        .agg(
            F.min(
                F.struct(F.col("d2").alias("d2"), F.col("code_id").alias("cid"))
            ).alias("__a")
        )
        .select(F.col(id_col), "s", F.col("__a.cid").alias("code_id"))
    )
    return codewords, codes


def ann_pq_knn(
    embeddings: DataFrame,
    k: int = 5,
    m: int = 16,
    n_codes: int | None = None,
    refine: int = 8,
    dim: int = 64,
    query_ids: Sequence[int] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: asymmetric distance computation (ADC) over the
    PQ codes builds a per-query shortlist of ``k * refine`` candidates,
    then exact cosine re-ranks the shortlist — the standard two-stage PQ
    search (coarse scan over compressed codes, fine scan over a few raw
    vectors).

    Each query computes one small lookup table (distance from its
    subvectors to every codeword — |q| x m x n_codes rows, broadcast);
    the corpus is then scored by summing m table lookups per vector.

    Physical shape at 100 TB: the only corpus-sized dataflows are the
    (id, s, code_id) code table — m small ints per vector, ~1% of the
    raw embedding bytes — and one hash-join fetch of the shortlist's raw
    vectors for re-ranking (|q| x k x refine rows). No full-width vector
    ever shuffles. Recall against brute force is gated in
    tests/test_similarity.py; like the other ANN paths the hashed output
    is (query_id, neighbor_id, rk) with scores kept out of the hash.
    """
    sub_len = dim // m
    codewords, codes = pq_index(embeddings, m, n_codes, dim, id_col, vec_col)
    # both the LUT (query side) and the scoring join reference the code
    # subtrees; persist so encode runs once per call, not per branch
    codewords = tracked_persist(codewords)
    codes = tracked_persist(codes)
    base = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("n", _norm(F.col("v")))
    q = base
    if query_ids is not None:
        q = base.where(F.col(id_col).isin(list(query_ids)))
    q_sub = q.select(
        F.col(id_col).alias("query_id"),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
        "v",
    ).select(
        "query_id", "s", F.expr(f"slice(v, s*{sub_len}+1, {sub_len})").alias("qv")
    )
    lut = q_sub.join(F.broadcast(codewords), "s").select(
        "query_id", "s", "code_id", _l2sq_dec(F.col("qv"), F.col("cw")).alias("d2q")
    )
    # force-broadcast only bounded query-derived sides; with
    # query_ids=None the "queries" are the whole corpus (LUT is n*m*c
    # rows) and broadcasting would OOM — let Catalyst pick the strategy
    lut_side = F.broadcast(lut) if query_ids is not None else lut
    scored = (
        codes.join(lut_side, ["s", "code_id"])
        .where(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", F.col(id_col).alias("neighbor_id"))
        .agg(F.sum("d2q").alias("adist"), F.count("*").alias("n_sub"))
        # only vectors with all m subspace lookups present (guards against
        # NULL/short embeddings dropping subspace rows silently)
        .where(F.col("n_sub") == m)
    )
    shortlist = top_k_per_group(
        scored, ["query_id"], [F.asc("adist"), F.asc("neighbor_id")], k * refine
    ).select("query_id", "neighbor_id")
    qv = q.select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"), F.col("n").alias("qn")
    )
    nv = base.select(
        F.col(id_col).alias("neighbor_id"), F.col("v").alias("nv"), F.col("n").alias("nn")
    )
    qv_side = F.broadcast(qv) if query_ids is not None else qv
    reranked = (
        shortlist.join(qv_side, "query_id")
        .join(nv, "neighbor_id")
        .withColumn("cos", _dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")))
    )
    ranked = top_k_per_group(
        reranked, ["query_id"], [F.desc("cos"), F.asc("neighbor_id")], k
    )
    return ranked.select("query_id", "neighbor_id", F.col("rk").cast("int").alias("rk"))
