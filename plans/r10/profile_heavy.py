"""Stage attribution for the two heaviest never-touched queries
(VERDICT r9 #6): prefix_filter_pairs and dedup_signal_consensus.

Mirrors each operator's internals with a timing point per tracked
intermediate (the profile_cascade.py discipline): every frame the
operator persists is materialized in order, so marginal times decompose
the same plan the query runs. Fresh process, sf0.001 warmup, N reps at
$SPARK_GRAFT_SF_DIR, minimum per stage.

    python plans/r10/profile_heavy.py [reps]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pipeline_pyspark_etl_imdb_spark import get_spark  # noqa: E402
from pipeline_pyspark_etl_imdb_spark.operators.util import (  # noqa: E402
    release_tracked,
    tracked_persist,
)

WARM_DIR = "/root/testdata/sf0.001"


def _prefix_stages(spark, sf_dir: str) -> dict[str, float]:
    from pipeline_pyspark_etl_imdb_spark.operators.neardup import verify_pairs_exact
    from pipeline_pyspark_etl_imdb_spark.operators.text import tokens, word_shingles
    from pipeline_pyspark_etl_imdb_spark.operators.util import fan_out

    out: dict[str, float] = {}
    t0 = time.perf_counter()

    def mark(stage: str) -> None:
        nonlocal t0
        out[stage] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()

    k, threshold = 3, 0.8
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    arr = tracked_persist(
        fan_out(docs)
        .select("doc_id", F.col("text").alias("__t"))
        .withColumn("__tok", tokens("__t"))
        .select(F.col("doc_id").alias("doc"), word_shingles("__tok", k).alias("sh"))
    )
    arr.count()
    mark("shingle_arrays+persist")
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
    prefix = tracked_persist(prefix)
    prefix.count()
    mark("df+rank_window+prefix")
    a = prefix.select(F.col("doc").alias("doc_a"), "shingle", F.col("n_sh").alias("n_a"))
    b = prefix.select(F.col("doc").alias("doc_b"), "shingle", F.col("n_sh").alias("n_b"))
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
    n_cand = cand.count()
    mark("prefix_selfjoin+distinct")
    verify_pairs_exact(
        docs, cand, k, threshold,
        shingle_arrays=arr.select(F.col("doc").alias("doc_id"), "sh"),
    ).count()
    mark("verify_exact")
    out["n_cand"] = n_cand
    return out


def _consensus_stages(spark, sf_dir: str) -> dict[str, float]:
    from pipeline_pyspark_etl_imdb_spark.operators.neardup import lsh_verified_pairs
    from pipeline_pyspark_etl_imdb_spark.operators.similarity import cosine_dup_pairs

    out: dict[str, float] = {}
    t0 = time.perf_counter()

    def mark(stage: str) -> None:
        nonlocal t0
        out[stage] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    tp = tracked_persist(
        lsh_verified_pairs(docs, threshold=0.8).withColumn("__txt", F.lit(True))
    )
    tp.count()
    mark("lsh_verified_pairs")
    ep = tracked_persist(
        cosine_dup_pairs(emb, threshold=0.35).withColumn("__emb", F.lit(True))
    )
    ep.count()
    mark("cosine_dup_pairs")
    (
        tp.join(ep, ["doc_a", "doc_b"], "full_outer")
        .select(
            "doc_a",
            "doc_b",
            F.col("jaccard").alias("text_jaccard"),
            F.coalesce(F.col("__txt"), F.lit(False)).alias("in_text"),
            F.coalesce(F.col("__emb"), F.lit(False)).alias("in_embedding"),
        )
        .orderBy("doc_a", "doc_b")
        .count()
    )
    mark("full_outer+sort")
    return out


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-heavy")

    def cool_down() -> None:
        release_tracked()
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    results: dict[str, dict[str, float]] = {}
    for name, fn in (("prefix_filter", _prefix_stages), ("consensus", _consensus_stages)):
        fn(spark, WARM_DIR if os.path.isdir(WARM_DIR) else sf_dir)
        cool_down()
        best: dict[str, float] = {}
        for _ in range(reps):
            got = fn(spark, sf_dir)
            cool_down()
            for k, v in got.items():
                best[k] = min(best.get(k, float("inf")), v)
        results[name] = best
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
