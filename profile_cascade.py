"""Stage attribution for dedup_cascade_report (VERDICT r8 item #3).

The cascade is the sweep's heaviest query and drifted upward three
rounds running (5.95 -> 7.25 -> 7.99 in-sweep; isolated pins 5.95 r6,
7.35 r8) with neardup.py untouched — the composite number can't say
WHICH stage grew. This mirrors dedup_cascade's internals with a timing
point per stage (every intermediate the operator tracked_persists is
materialized in order, so the marginal times decompose the same plan
the query runs) in a fresh process: sf0.001 warmup, then N reps at
$SPARK_GRAFT_SF_DIR, minimum per stage reported.

    python profile_cascade.py            # 3 reps at sf0.1

Output: one JSON line {stage: best_sec} — paste into ROUND*_NOTES and
keep watchlist.py's stage-level pin note in sync.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F


def _stages(spark, sf_dir: str) -> dict[str, float]:
    from pipeline_pyspark_etl_imdb_spark.operators.components import (
        connected_components,
    )
    from pipeline_pyspark_etl_imdb_spark.operators.neardup import (
        _containment_pairs_and_postings,
        jaccard_pairs_from_shingles,
    )
    from pipeline_pyspark_etl_imdb_spark.operators.util import tracked_persist

    out: dict[str, float] = {}
    t0 = time.perf_counter()

    def mark(stage: str) -> None:
        nonlocal t0
        out[stage] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = tracked_persist(
        docs.select(
            F.col("doc_id"), F.col("text"), F.md5(F.col("text")).alias("__h")
        )
    )
    base.count()
    mark("scan_md5")

    groups = base.groupBy("__h").agg(F.min("doc_id").alias("exact_canonical"))
    s1 = tracked_persist(base.join(groups, "__h").drop("__h"))
    surv1 = tracked_persist(
        s1.where(F.col("doc_id") == F.col("exact_canonical")).select(
            "doc_id", "text"
        )
    )
    surv1.count()
    mark("exact")

    pairs, postings = _containment_pairs_and_postings(surv1)
    contained = tracked_persist(
        pairs.groupBy("inner_doc").agg(F.min("outer_doc").alias("container"))
    )
    surv2 = tracked_persist(
        surv1.join(
            contained, surv1["doc_id"] == contained["inner_doc"], "left_anti"
        )
    )
    surv2.count()
    mark("containment")

    sh2 = postings.join(surv2.select("doc_id"), "doc_id", "left_semi")
    edges = jaccard_pairs_from_shingles(
        sh2, threshold=0.8, max_shingle_df=1000
    ).select("doc_a", "doc_b")
    edges = tracked_persist(edges)
    edges.count()
    mark("jaccard")

    comp = tracked_persist(connected_components(edges))
    comp.count()
    mark("components")

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
            surv2.join(near_dropped.select("doc_id"), "doc_id", "left_anti")
            .select(
                "doc_id",
                F.lit(True).alias("keep"),
                F.lit("kept").alias("stage"),
                F.col("doc_id").alias("canonical_id"),
            )
        )
    )
    report.orderBy("doc_id").count()
    mark("report_assembly")
    out["total"] = round(sum(v for k, v in out.items() if k != "total"), 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_reps = int(os.environ.get("SPARK_GRAFT_PIN_RUNS", "3"))

    from pipeline_pyspark_etl_imdb_spark import get_spark
    from pipeline_pyspark_etl_imdb_spark.operators.util import release_tracked

    spark = get_spark("profile-cascade")
    warm = "/root/testdata/sf0.001"
    _stages(spark, warm if os.path.isdir(warm) else sf_dir)
    release_tracked()
    spark.catalog.clearCache()

    import gc

    best: dict[str, float] = {}
    for _ in range(n_reps):
        rep = _stages(spark, sf_dir)
        for k, v in rep.items():
            best[k] = min(best.get(k, float("inf")), v)
        # forced driver GC OUTSIDE the timed region (the pin.py/bench.py
        # cool-down): reclaim cleaner state now, not mid-stage
        release_tracked()
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
    print(json.dumps({"sf_dir": sf_dir, "reps": n_reps, "stages_best": best}))
    spark.stop()


if __name__ == "__main__":
    main()
