"""Prototypicality scoring: cosine of each embedding to its class
centroid — the "distance to prototype" signal behind CLIP-score-style
filtering and SemDeDup's within-cluster pruning (Abbas et al. 2023,
Sorscher et al. 2022 "Beyond neural scaling laws": prune the most
prototypical examples in big data regimes, the least prototypical in
small ones). The reference engine has no embedding surface; this extends
the reference's group-aggregate family (SURVEY.md §2 A1) to vector
columns, reference parity cited at src/etl_imdb.py:214-230 (groupBy-agg
shape).

Exactness contract (the whole reason this is oracle-backed rather than
rows-only like k-means): centroid sums accumulate per-dimension in
DECIMAL(20,10), so they are order-independent and bit-identical across
engines; every downstream float op (divide by count, dot, norms, sqrt)
is a FIXED-ORDER scalar expression evaluated identically by Spark and
DuckDB. No float summation-order nondeterminism anywhere.

Physical shape (the one that survives 100 TB):
- centroid: ONE partial-aggregated groupBy(label) carrying a
  per-dimension DECIMAL sum battery + count — k rows x (dim+1) columns
  cross the wire, nothing corpus-sized (same battery as
  kmeans.centroid_update, plan-gated there);
- scoring: the k x dim centroid frame is broadcast back onto the corpus
  and the cosine is a map-only zip_with/aggregate fold — zero shuffle;
- ranking: one window partitioned by label. Labels are the partition
  key, so a degenerate label distribution concentrates a window
  partition; at 100x either accept it (rank is per-label sequential by
  definition) or replace the rank with an approx-quantile threshold
  (two scans, no window) — the operator exposes the scored frame so
  callers can do exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(20,10)"


def label_centroids(
    embeddings: DataFrame,
    dim: int,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """(label, centroid: array<double>) — per-label mean vector with
    DECIMAL-exact (order-independent) per-dimension sums. The float ->
    double -> decimal cast chain is mirrored verbatim in the oracle so
    both engines round the same binary value the same way."""
    dec = [
        F.sum(F.element_at(vec_col, i + 1).cast("double").cast(_DEC)).alias(f"__s{i}")
        for i in range(dim)
    ]
    return (
        embeddings.groupBy(F.col(label_col).alias("label"))
        .agg(F.count("*").alias("__n"), *dec)
        .select(
            "label",
            F.array(
                *[
                    (F.col(f"__s{i}").cast("double") / F.col("__n")).alias(f"c{i}")
                    for i in range(dim)
                ]
            ).alias("centroid"),
        )
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def centroid_cosine_scores(
    embeddings: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, label, cos_centroid, outlier_rank): cosine of each vector
    to its OWN label's centroid, plus the within-label ascending rank
    (rank 1 = least prototypical = first to inspect/drop in a small-data
    regime, last to drop in a big-data one).

    The centroid frame is k rows — broadcast join, map-only cosine."""
    cents = label_centroids(embeddings, dim, label_col=label_col, vec_col=vec_col)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scored = (
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.col(label_col).alias("label"),
            v.alias("__v"),
        )
        .join(F.broadcast(cents), "label")
        .select(
            "vec_id",
            "label",
            (
                _dot(F.col("__v"), F.col("centroid"))
                / (
                    F.sqrt(_dot(F.col("__v"), F.col("__v")))
                    * F.sqrt(_dot(F.col("centroid"), F.col("centroid")))
                )
            ).alias("cos_centroid"),
        )
    )
    w = Window.partitionBy("label").orderBy(
        F.col("cos_centroid").asc(), F.col("vec_id").asc()
    )
    return scored.withColumn("outlier_rank", F.row_number().over(w))


def label_confusion_matrix(
    embeddings: DataFrame,
    dim: int,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """(label_a, label_b, cos_centroids) for label_a < label_b: pairwise
    cosine between class centroids — the class-separability report (high
    centroid cosine = the embedding space barely separates the pair, the
    dataset-design signal behind label-merge/relabel decisions).

    The corpus is touched exactly ONCE, by the centroid battery; the
    k x dim result is MODEL STATE (the k-means-centroid class of driver
    metadata), so the k(k-1)/2 pairing runs on the driver in plain
    Python floats — the same IEEE doubles in the same fold order as the
    oracle's SQL chains, hence still oracle-backed. A distributed self-
    join version was measured 4x slower at sf0.1 purely on Catalyst
    planning of the duplicated 64-column DECIMAL battery (both join
    sides re-derive it), with zero scale benefit: k is small by
    definition."""
    import math

    # NULL labels form no class and NULL embeddings carry no mass — both
    # would crash the driver-side pairing (None is unorderable/unzippable)
    embeddings = embeddings.where(
        F.col(label_col).isNotNull() & F.col(vec_col).isNotNull()
    )
    cents = label_centroids(embeddings, dim, label_col=label_col, vec_col=vec_col)
    rows = sorted(cents.collect(), key=lambda r: r.label)
    out = []
    for i, ra in enumerate(rows):
        for rb in rows[i + 1 :]:
            dot = norm_a = norm_b = 0.0
            for x, y in zip(ra.centroid, rb.centroid):
                dot += x * y
                norm_a += x * x
                norm_b += y * y
            out.append(
                (ra.label, rb.label, dot / (math.sqrt(norm_a) * math.sqrt(norm_b)))
            )
    return embeddings.sparkSession.createDataFrame(
        out, "label_a int, label_b int, cos_centroids double"
    ).orderBy("label_a", "label_b")
