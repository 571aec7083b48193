"""End-to-end IMDb-pipeline benchmark (the like-for-like against BASELINE.md).

The 256-query sweep in bench.py measures the operator surface; BASELINE.md's
only reference number (~12 min / 720 s on Colab ~2 vCPU) is the reference's
FULL pipeline — gzip-TSV read -> stage -> dims/fact -> 4 marts -> 9 parquet
writes + the --show-counts count jobs, with staging recomputed ~9x
(/root/reference/src/etl_imdb.py:302-311, SURVEY.md §3 EP1.7). This script
makes that comparison direct (VERDICT r6 missing#1):

1. Generates an IMDb-SHAPED fixture once (cached under .cache/): title.basics
   + title.ratings as gzip TSV with the real dumps' schema, null markers,
   duplicate keys, and the full dump's selectivities — titleType='movie'
   ~6.2%, ratings coverage ~13.7% overall / ~46% of movies, 1-3 genres from
   the 28-genre vocabulary, 136 distinct years — at a RECORDED row count
   (default the 2026-01-08 dump's 11.8M basics / 1.62M ratings rows;
   override with SPARK_GRAFT_IMDB_ROWS for smoke runs).
2. Times plans/imdb_cli.py end-to-end in THIS process — session start,
   staging, 9 writes, --show-counts — exactly the work inside the
   reference's 720 s (single-stream gzip parse included: gzip is
   non-splittable, so the scan is one task, same as Colab).
3. Prints one JSON line and writes bench_imdb_r<N>.json beside this script.

Usage: python bench_imdb.py
Env:   SPARK_GRAFT_IMDB_ROWS  basics row count (default 11_800_000)
       SPARK_GRAFT_ROUND      round number for the artifact name
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import shutil
import sys
import tempfile
import time

import numpy as np
import pandas as pd

HERE = os.path.dirname(os.path.abspath(__file__))
SEED = 7
DEFAULT_ROWS = 11_800_000
RATINGS_FRACTION_MOVIE = 0.459  # fact_ratings/titles_stg in BASELINE.md
RATINGS_FRACTION_OTHER = 0.116  # (ratings - fact)/(basics - movies)
CHUNK = 1_000_000

GENRES = (
    "Action Adult Adventure Animation Biography Comedy Crime Documentary "
    "Drama Family Fantasy Film-Noir Game-Show History Horror Music Musical "
    "Mystery News Reality-TV Romance Sci-Fi Short Sport Talk-Show Thriller "
    "War Western"
).split()
TITLE_TYPES = np.array(
    ["tvEpisode", "short", "movie", "video", "tvSeries", "tvMovie",
     "tvSpecial", "videoGame", r"\N"]
)
TITLE_TYPE_P = np.array(
    [0.6126, 0.16, 0.0624, 0.05, 0.045, 0.03, 0.012, 0.02, 0.008]
)


def _genre_pool(rng: np.random.Generator, size: int = 8192) -> np.ndarray:
    """Pre-sampled genre strings (1-3 genres, mean ~1.37 — the bridge/movies
    ratio in BASELINE.md); rows draw an index instead of re-sampling, which
    is ~50x faster at 11.8M rows and statistically equivalent for the
    pipeline's explode/dedup work."""
    n_genres = rng.choice([1, 2, 3], size=size, p=[0.70, 0.23, 0.07])
    pool = []
    for k in n_genres:
        picks = rng.choice(len(GENRES), size=k, replace=False)
        pool.append(",".join(GENRES[i] for i in picks))
    return np.array(pool)


def _fixture_dir(n_rows: int) -> str:
    return os.path.join(HERE, ".cache", f"imdb_fixture_{n_rows}")


def generate_fixture(n_rows: int) -> dict:
    """Write title.basics.tsv.gz / title.ratings.tsv.gz; return metadata."""
    out = _fixture_dir(n_rows)
    meta_path = os.path.join(out, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            return json.load(fh)
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(SEED)
    pool = _genre_pool(rng)
    t0 = time.perf_counter()

    basics_path = os.path.join(out, "title.basics.tsv.gz")
    n_ratings = 0
    ratings_ids: list[np.ndarray] = []
    with gzip.open(basics_path, "wt", compresslevel=1) as fh:
        fh.write(
            "tconst\ttitleType\tprimaryTitle\toriginalTitle\tisAdult\t"
            "startYear\tendYear\truntimeMinutes\tgenres\n"
        )
        for lo in range(0, n_rows, CHUNK):
            hi = min(lo + CHUNK, n_rows)
            m = hi - lo
            ids = np.arange(lo, hi)
            # ~0.1% duplicate keys exercise the dedup survivorship path
            dup = rng.random(m) < 0.001
            ids = np.where(dup & (ids > 0), ids - 1, ids)
            tconst = np.char.add("tt", np.char.zfill(ids.astype("U9"), 9))
            ttype = TITLE_TYPES[rng.choice(len(TITLE_TYPES), m, p=TITLE_TYPE_P)]
            title = np.char.add("Title ", ids.astype("U9"))
            title[rng.random(m) < 0.002] = r"\N"
            year = rng.integers(1894, 2030, m).astype("U4")
            year[rng.random(m) < 0.08] = r"\N"
            runtime = rng.integers(1, 301, m).astype("U3")
            runtime[rng.random(m) < 0.55] = r"\N"
            genres = pool[rng.integers(0, len(pool), m)]
            genres[rng.random(m) < 0.04] = r"\N"
            is_adult = np.where(rng.random(m) < 0.02, "1", "0").astype("U2")
            is_adult[rng.random(m) < 0.001] = r"\N"
            pd.DataFrame(
                {
                    "tconst": tconst,
                    "titleType": ttype,
                    "primaryTitle": title,
                    "originalTitle": title,
                    "isAdult": is_adult,
                    "startYear": year,
                    "endYear": np.full(m, r"\N"),
                    "runtimeMinutes": runtime,
                    "genres": genres,
                }
            ).to_csv(fh, sep="\t", header=False, index=False)
            # rate movies at ~46% (fact_ratings/titles_stg), others ~11.6%
            p_rate = np.where(ttype == "movie", RATINGS_FRACTION_MOVIE,
                              RATINGS_FRACTION_OTHER)
            rated = ids[rng.random(m) < p_rate]
            ratings_ids.append(rated)
            n_ratings += len(rated)

    ratings_path = os.path.join(out, "title.ratings.tsv.gz")
    with gzip.open(ratings_path, "wt", compresslevel=1) as fh:
        fh.write("tconst\taverageRating\tnumVotes\n")
        for rated in ratings_ids:
            m = len(rated)
            rating = np.clip(rng.normal(6.9, 1.4, m), 1.0, 10.0).round(1)
            votes = np.maximum(
                np.exp(rng.normal(3.6, 2.0, m)).astype(np.int64), 5
            )
            pd.DataFrame(
                {
                    "tconst": np.char.add(
                        "tt", np.char.zfill(rated.astype("U9"), 9)
                    ),
                    "averageRating": rating.astype("U4"),
                    "numVotes": votes.astype("U12"),
                }
            ).to_csv(fh, sep="\t", header=False, index=False)

    meta = {
        "seed": SEED,
        "rows_basics": int(n_rows),
        "rows_ratings": int(n_ratings),
        "gz_bytes_basics": os.path.getsize(basics_path),
        "gz_bytes_ratings": os.path.getsize(ratings_path),
        "generate_sec": round(time.perf_counter() - t0, 1),
    }
    with open(meta_path, "w") as fh:
        json.dump(meta, fh, indent=1)
    return meta


def _artifact_path() -> str:
    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        n = int(env)
    else:
        rounds = [
            int(m.group(1))
            for p in glob.glob(os.path.join(HERE, "BENCH_r*.json"))
            if (m := re.search(r"BENCH_r(\d+)\.json$", p))
        ]
        n = (max(rounds) + 1) if rounds else 1
    return os.path.join(HERE, f"bench_imdb_r{n:02d}.json")


def main() -> None:
    n_rows = int(os.environ.get("SPARK_GRAFT_IMDB_ROWS", DEFAULT_ROWS))
    meta = generate_fixture(n_rows)
    print(f"[bench_imdb] fixture: {json.dumps(meta)}", file=sys.stderr)

    from pipeline_pyspark_etl_imdb_spark.plans import imdb_cli

    work = tempfile.mkdtemp(prefix="imdb_bench_")
    raw_dir = _fixture_dir(n_rows)
    t0 = time.perf_counter()
    try:
        imdb_cli.main(
            [
                "--raw-dir", raw_dir,
                "--dw-dir", os.path.join(work, "dw"),
                "--marts-dir", os.path.join(work, "marts"),
                "--show-counts",
            ]
        )
        wall = round(time.perf_counter() - t0, 2)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    record = {
        "metric": "imdb_pipeline_e2e_wall",
        "value": wall,
        "unit": "sec",
        "baseline_sec": 720,
        "fixture": meta,
        "includes": "session start, gzip-TSV stage, 5 DW + 4 mart parquet "
        "writes, --show-counts count jobs",
    }
    print(json.dumps(record))
    with open(_artifact_path(), "w") as fh:
        json.dump(record, fh, indent=1)
        fh.write("\n")


if __name__ == "__main__":
    main()
