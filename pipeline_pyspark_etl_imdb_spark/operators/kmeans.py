"""Lloyd's k-means on DataFrames — the third iterative-algorithm shape.

Connected components propagates a MIN label, PageRank a weighted mass;
k-means iterates FLOAT CENTROIDS: broadcast-assign, groupBy-update. It's
the clustering step behind SemDeDup-style semantic dedup and
diversity-balanced sampling over an embedded corpus (public method:
Abbas et al. 2023), and the training loop real IVF indexes run once at
build time (operators/similarity.ivf_index uses the 0-iteration
hash-pick variant; this is the same physical shape iterated).

Physical shape per iteration (the one that survives 100 TB):
- assignment: corpus x BROADCAST(k centroids) -> per-row argmin — map
  only, nothing shuffles but the k-row centroid table;
- update: ONE partial-aggregated groupBy(cluster) with a per-dimension
  sum battery (element_at, map-side combine) — the shuffle carries k
  rows x (dim+1) columns, nothing corpus-sized moves and there is no
  (cluster, dim) posexplode shuffle;
- the k x dim centroid frame localCheckpoints each round so the plan
  stays O(1), exactly like the CC/PageRank loops.

Determinism: init is an md5-ordered top-k pick (no RNG); the only
nondeterminism is float-mean summation order (last-ulp), so the
registry exposure is rows-only and tests/test_kmeans.py pins assignments
and centroids against an independent NumPy Lloyd's run from the same
init instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.util import fan_out


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def seed_centroids(
    embeddings: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic seed centroids: the min(n, k) corpus vectors with the
    smallest md5(id || ':kmeans') values, renumbered 0..k-1 in id order.

    orderBy + limit compiles to TakeOrderedAndProject — per-partition
    top-k then a driver-side merge of k rows, no global sort, no Exchange
    of the corpus (same shape as corpus.global_hash_sample). Guarantees
    EXACTLY min(n, k) seeds; the previous mod-stride filter made the
    survivor count a Binomial draw with mean ~k, which silently under-
    seeded on roughly half of possible corpora. The renumbering window is
    partition-less but sees only the k survivors."""
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":kmeans")))
    picked = (
        embeddings.select(F.col(id_col), F.col(vec_col), h.alias("__h"))
        .orderBy(F.col("__h").asc(), F.col(id_col).asc())
        .limit(k)
    )
    w = Window.orderBy(F.col(id_col).asc())
    return (
        picked.withColumn("__rn", F.row_number().over(w))
        .select(
            (F.col("__rn") - 1).alias("cluster"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("centroid"),
        )
    )


# backward-compatible alias (the guaranteed-count pick replaced the
# binomial mod-stride pick; same signature and output contract)
stride_init_centroids = seed_centroids


def centroid_update(assigned: DataFrame, dim: int) -> DataFrame:
    """Per-cluster centroid means as ONE partial-aggregated groupBy whose
    shuffle carries k rows x (dim+1) columns: a per-dimension sum battery
    over element_at plus a count, divided back into an array. No
    (cluster, dim) posexplode — the explode shape shuffles n*dim rows and
    adds a second aggregation; this shape's map-side combine collapses
    everything to k rows per partition before the wire (plan-gated in
    tests/test_kmeans.py)."""
    sum_cols = [F.sum(F.element_at("v", i + 1)).alias(f"__s{i}") for i in range(dim)]
    return (
        assigned.groupBy("cluster")
        .agg(F.count("*").alias("__n"), *sum_cols)
        .select(
            "cluster",
            F.array(*[F.col(f"__s{i}") / F.col("__n") for i in range(dim)]).alias(
                "centroid"
            ),
        )
    )


def lloyd_kmeans(
    embeddings: DataFrame,
    k: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """(assignments, centroids) after ``n_iter`` synchronous Lloyd
    rounds. assignments = (id, cluster, sq_dist); centroids = (cluster,
    centroid array). Ties in the argmin break toward the lower cluster
    id (deterministic)."""
    emb = fan_out(embeddings).select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).persist()
    centroids = seed_centroids(embeddings, k, id_col, vec_col)
    # one driver-side scalar (first-row probe) fixes the width of the
    # per-dimension sum battery below
    dim = emb.select(F.size("v").alias("d")).first().d

    def assign(cents: DataFrame, with_v: bool = False) -> DataFrame:
        scored = emb.crossJoin(F.broadcast(cents)).select(
            id_col, "v", "cluster", _sq_dist(F.col("v"), F.col("centroid")).alias("d")
        )
        # argmin as ONE partial-aggregated struct-min (lexicographic on
        # (d, cluster) = min distance, ties to the lower cluster id) —
        # the map-side combine collapses the k candidates per id before
        # the shuffle; a row_number window here would sort every id group.
        # with_v carries the vector through the same aggregate (constant
        # within the id group) so the update loop needs NO second join
        # against emb.
        aggs = [F.min(F.struct("d", "cluster")).alias("__s")]
        if with_v:
            aggs.append(F.any_value("v").alias("v"))
        cols = [
            F.col(id_col),
            F.col("__s.cluster").alias("cluster"),
            F.col("__s.d").alias("sq_dist"),
        ] + ([F.col("v")] if with_v else [])
        return scored.groupBy(id_col).agg(*aggs).select(*cols)

    for _ in range(n_iter):
        assigned = assign(centroids, with_v=True)
        new_cents = centroid_update(assigned, dim)
        # clusters that lost every member keep their previous centroid
        centroids = (
            centroids.select("cluster", F.col("centroid").alias("__old"))
            .join(new_cents, "cluster", "left")
            .select("cluster", F.coalesce("centroid", "__old").alias("centroid"))
            .localCheckpoint(eager=True)
        )
    out = assign(centroids)
    emb.unpersist()
    return out, centroids
