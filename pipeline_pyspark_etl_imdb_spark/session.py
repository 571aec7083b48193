"""SparkSession builder.

Replaces the reference's ``build_spark`` (/root/reference/src/etl_imdb.py:79-87)
with a scale-aware configuration:

- AQE on (runtime partition coalescing + skew-join handling) instead of a
  fixed ``spark.sql.shuffle.partitions=200``.
- ``spark.sql.session.timeZone=UTC`` so timestamp semantics match external
  oracles (DuckDB is UTC-naive).
- ANSI mode OFF: the reference relies on Spark 3.x cast semantics where a
  non-numeric string casts to NULL rather than raising
  (/root/reference/src/etl_imdb.py:135-137,146-147); Spark 4 flipped the
  default to ANSI=on, so we pin it back for parity.
- Arrow enabled for any Pandas-UDF path.

On a real cluster the same builder is used; only ``master`` and memory come
from the environment (spark-submit), so nothing here hardcodes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Local-mode parallelism: the test/bench environment is a single JVM; a real
# deployment overrides via SPARK_GRAFT_CPUS or spark-submit conf.
_DEFAULT_LOCAL_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "pipeline_pyspark_etl_imdb_spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession tuned for this engine.

    ``shuffle_partitions`` defaults to the local core count — at 100 TB on a
    real cluster you'd size it to ~2-3x total executor cores (or just let
    AQE coalesce from a high initial number, which is what
    ``spark.sql.adaptive.coalescePartitions`` gives us).
    """
    cpus = int(_DEFAULT_LOCAL_CPUS)
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # the fixture events table stores TIMESTAMP(NANOS); Spark has no
        # nanosecond timestamp type, so read it as bigint nanoseconds
        # (operators normalize via eventtime.ts_micros)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # long driver sessions run hundreds of jobs: cap the status-store
        # history (the listeners retain plan graphs/job state even with the
        # UI off) and let the ContextCleaner actually reclaim shuffle/
        # broadcast/checkpoint state (its cleanups ride on driver GC, and
        # the 30min default periodicGC never fires inside a bench run)
        .config("spark.sql.ui.retainedExecutions", "16")
        .config("spark.ui.retainedJobs", "100")
        .config("spark.ui.retainedStages", "100")
        .config("spark.ui.retainedTasks", "2000")
        # (periodic GC stays at a coarse interval — a full GC of a large
        # local heap mid-query is a stop-the-world stall; batch drivers
        # like bench.py trigger GC between queries instead)
        .config("spark.cleaner.periodicGC.interval", "10min")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g"))
        # managed-table warehouse (bucketed tables): static conf, so it must
        # be set here; keep it out of the repo tree
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"),
        )
    )
    if master:
        builder = builder.master(master)
    elif "SPARK_MASTER" not in os.environ and not os.environ.get("SPARK_SUBMIT"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
