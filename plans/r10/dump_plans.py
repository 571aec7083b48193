"""Dump .explain("formatted") for every registry query at a given SF.

Usage: python plans/r10/dump_plans.py [before|after] [<name-regex>]

Writes plans/r10/<query>_<tag>.txt for each query. Queries whose frame
construction itself runs jobs (size-guard counts, iterative loops) still
plan fine — the dump captures the FINAL returned frame's physical plan.
"""

from __future__ import annotations

import os
import re
import sys
import traceback

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)

from pipeline_pyspark_etl_imdb_spark import get_spark  # noqa: E402
from pipeline_pyspark_etl_imdb_spark.operators.util import release_tracked  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    pat = re.compile(sys.argv[2]) if len(sys.argv) > 2 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod

    spark = get_spark("plan-dump")
    queries = entry_mod.queries()
    failed = []
    for name, fn in sorted(queries.items()):
        if pat and not pat.search(name):
            continue
        out = os.path.join(HERE, f"{name}_{tag}.txt")
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(out, "w") as fh:
                fh.write(plan)
        except Exception:
            failed.append(name)
            with open(out, "w") as fh:
                fh.write("PLAN DUMP FAILED\n" + traceback.format_exc())
        release_tracked()
        spark.catalog.clearCache()
    print(f"done; {len(failed)} failures: {failed}")
    spark.stop()


if __name__ == "__main__":
    main()
