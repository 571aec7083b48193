"""Isolated best-of-3 pin runner — the watchlist follow-up protocol.

A watchlist flag is a measurement TODO; the only trustworthy follow-up
signal is an ISOLATED pin (fresh JVM, nothing else on the box, sf0.001
warmup of the same query shape, 3 timed runs at sf0.1, best kept —
ROUND5–7 notes ran this by hand each time). This makes it one command:

    python pin.py vocab_coverage_curve vocab_zipf_fit

Each query gets its OWN subprocess (one JVM per pin — a shared session
is exactly the contamination the protocol exists to remove). Prints one
line per query and a final JSON map; paste results into watchlist.PINS
with a note.

Env: SPARK_GRAFT_SF_DIR (timed fixture, default /root/testdata/sf0.1),
     SPARK_GRAFT_PIN_RUNS (default 3).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

WARM_DIR = "/root/testdata/sf0.001"


def _pin_one(name: str) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("SPARK_GRAFT_PIN_RUNS", "3"))

    from pipeline_pyspark_etl_imdb_spark import get_spark
    from pipeline_pyspark_etl_imdb_spark.operators.util import release_tracked

    import __spark_entry__ as entry_mod

    fn = entry_mod.queries()[name]
    spark = get_spark(f"pin-{name}")

    def cool_down() -> None:
        # bench.py's cool_down verbatim: without the forced DRIVER GC the
        # ContextCleaner reclaims shuffle/broadcast/checkpoint state
        # whenever a full GC happens to strike — which is MID-RUN for
        # multi-job iterative shapes (measured: dedup_cascade_report
        # 5.4-78 s per run without this, 6.3-9.2 s with it; the r6-r8
        # "pin drift" was exactly these pauses sampled by best-of-3)
        import gc

        release_tracked()
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    fn(spark, WARM_DIR if os.path.isdir(WARM_DIR) else sf_dir).count()
    cool_down()
    best = float("inf")
    runs = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        runs.append(round(time.perf_counter() - t0, 3))
        best = min(best, runs[-1])
        cool_down()
    print(json.dumps({"query": name, "pin": round(best, 3), "runs": n_runs, "all": runs}))
    spark.stop()


def main() -> int:
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        _pin_one(sys.argv[2])
        return 0
    names = sys.argv[1:]
    if not names:
        print("usage: python pin.py QUERY [QUERY...]", file=sys.stderr)
        return 2
    pins: dict[str, float] = {}
    for name in names:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = next(
            (ln for ln in out.stdout.splitlines() if ln.startswith("{")), None
        )
        if out.returncode != 0 or line is None:
            print(f"{name}: PIN FAILED\n{out.stderr[-2000:]}", file=sys.stderr)
            continue
        rec = json.loads(line)
        pins[name] = rec["pin"]
        print(f"{name}: {rec['pin']:.3f}s (best of {rec['runs']}, isolated)")
    print(json.dumps(pins))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
