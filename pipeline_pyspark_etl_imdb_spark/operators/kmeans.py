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
- update: posexplode the assigned vectors to (cluster, dim, value) and
  partial-aggregated groupBy mean — one shuffle of k*dim result rows
  (the n*dim explode combines map-side);
- the k x dim centroid frame localCheckpoints each round so the plan
  stays O(1), exactly like the CC/PageRank loops.

Determinism: init is the same md5-stride pick as ivf_index (no RNG); the
only nondeterminism is float-mean summation order (last-ulp), so the
registry exposure is rows-only and tests/test_kmeans.py pins assignments
and centroids against an independent NumPy Lloyd's run from the same
init instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.corpus import hex_uniform
from pipeline_pyspark_etl_imdb_spark.operators.util import fan_out


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def stride_init_centroids(
    embeddings: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic seed centroids: corpus vectors whose md5-uniform
    value is 0 mod stride, renumbered by id order (k small -> the window
    runs over ~k rows, not the corpus)."""
    n = embeddings.select(F.col(id_col)).count()
    stride = max(n // k, 1)
    # 8 hex chars (32-bit range) so stride can exceed 2^16 on huge corpora
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":kmeans")))
    picked = embeddings.withColumn("__h", h).where(
        (hex_uniform("__h", 8) % stride) == 0
    )
    # deterministic cut to exactly k: rank by id over the ~k survivors
    # (the stride filter already shrank the frame, so this partition-less
    # window sees ~k rows, not the corpus)
    w = Window.orderBy(F.col(id_col).asc())
    return (
        picked.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(
            (F.col("__rn") - 1).alias("cluster"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("centroid"),
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
    centroids = stride_init_centroids(embeddings, k, id_col, vec_col)

    def assign(cents: DataFrame) -> DataFrame:
        scored = emb.crossJoin(F.broadcast(cents)).select(
            id_col, "cluster", _sq_dist(F.col("v"), F.col("centroid")).alias("d")
        )
        # argmin as ONE partial-aggregated struct-min (lexicographic on
        # (d, cluster) = min distance, ties to the lower cluster id) —
        # the map-side combine collapses the k candidates per id before
        # the shuffle; a row_number window here would sort every id group
        return (
            scored.groupBy(id_col)
            .agg(F.min(F.struct("d", "cluster")).alias("__s"))
            .select(
                id_col,
                F.col("__s.cluster").alias("cluster"),
                F.col("__s.d").alias("sq_dist"),
            )
        )

    for _ in range(n_iter):
        assigned = assign(centroids).join(emb, id_col)
        new_cents = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", "m"))
                ).alias("__dm")
            )
            .select(
                "cluster", F.transform("__dm", lambda s: s["m"]).alias("centroid")
            )
        )
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
