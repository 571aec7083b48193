"""Deterministic Spark-job counts per registry query (the r9/r10 A/B
evidence protocol: at sf0.1 this box is dispatch-bound, so job counts —
which are exact and noise-free — are the primary signal for loop-shape
changes; wall clock confirms only in interleaved same-session pairs).

Usage: SPARK_GRAFT_SF_DIR=... python plans/r10/jobcount.py QUERY [QUERY...]

Each query: one sf0.001 warmup (codegen/broadcast classes), cool-down,
then ONE sf0.1 run counting jobs via the status tracker. Prints a JSON
map {query: n_jobs}.
"""

from __future__ import annotations

import gc
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)

from pipeline_pyspark_etl_imdb_spark import get_spark  # noqa: E402
from pipeline_pyspark_etl_imdb_spark.operators.util import release_tracked  # noqa: E402

WARM_DIR = "/root/testdata/sf0.001"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod

    spark = get_spark("jobcount")
    sc = spark.sparkContext
    queries = entry_mod.queries()

    def cool_down() -> None:
        release_tracked()
        spark.catalog.clearCache()
        gc.collect()
        sc._jvm.System.gc()

    out: dict[str, int] = {}
    for name in sys.argv[1:]:
        fn = queries[name]
        fn(spark, WARM_DIR if os.path.isdir(WARM_DIR) else sf_dir).count()
        cool_down()
        before = set(sc.statusTracker().getJobIdsForGroup(None))
        fn(spark, sf_dir).count()
        after = set(sc.statusTracker().getJobIdsForGroup(None))
        release_tracked()
        out[name] = len(after - before)
        cool_down()
        print(f"[jobcount] {name}: {out[name]} jobs", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
