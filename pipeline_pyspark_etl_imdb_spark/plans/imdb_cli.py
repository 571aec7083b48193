"""CLI orchestrator for the IMDb warehouse: flag and behavior parity with
the reference's main() (/root/reference/src/etl_imdb.py:245-314).

Flags: --raw-dir --dw-dir --marts-dir --download --overwrite-download
--show-counts --min-votes (default 1000) --top-n (default 10), matching
the reference's argparse surface (E4 in SURVEY.md §2.10). Dropped on
purpose: the JAVA_HOME hardcoding and the Windows socketserver shim
(E2/E3) — environment cruft, not capabilities.

Differences by design (documented physical fixes, same outputs):
- staging is cached once instead of recomputed per downstream job;
- counts run off the cached staging tables;
- fact_ratings writes partitioned by yearkey with dynamic overwrite.

Usage: python -m pipeline_pyspark_etl_imdb_spark.plans.imdb_cli --raw-dir raw ...
"""

from __future__ import annotations

import argparse
import pathlib
import sys

from pipeline_pyspark_etl_imdb_spark.plans.imdb import ImdbWarehouse
from pipeline_pyspark_etl_imdb_spark.session import get_spark
from pipeline_pyspark_etl_imdb_spark.sources.http_fetch import (
    download_imdb,
    ensure_files_exist,
)
from pipeline_pyspark_etl_imdb_spark.sources.parquet_io import write_parquet

DW_TABLES = ("dim_year", "dim_title", "dim_genre", "bridge_title_genre", "fact_ratings")
MART_TABLES = (
    "mart_year_kpi",
    "mart_top_genre_year",
    "mart_top_year_by_rating",
    "mart_rating_distribution",
)


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="IMDb star-schema warehouse ETL")
    p.add_argument("--raw-dir", default="raw")
    p.add_argument("--dw-dir", default="dw")
    p.add_argument("--marts-dir", default="marts")
    p.add_argument("--download", action="store_true")
    p.add_argument("--overwrite-download", action="store_true")
    p.add_argument("--show-counts", action="store_true")
    p.add_argument("--min-votes", type=int, default=1000)
    p.add_argument("--top-n", type=int, default=10)
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> None:
    args = parse_args(argv)
    raw = pathlib.Path(args.raw_dir)
    basics = raw / "title.basics.tsv.gz"
    ratings = raw / "title.ratings.tsv.gz"

    if args.download:
        download_imdb(raw, overwrite=args.overwrite_download)
    ensure_files_exist([basics, ratings])

    spark = get_spark("imdb_etl")
    wh = ImdbWarehouse(
        spark,
        str(basics),
        str(ratings),
        min_votes=args.min_votes,
        top_n=args.top_n,
    )
    try:
        tables = wh.build()

        if args.show_counts:
            for name, df in tables.items():
                print(f"[stats] {name}: {df.count()}", file=sys.stderr)

        for name in DW_TABLES:
            write_parquet(
                tables[name],
                str(pathlib.Path(args.dw_dir) / name),
                partition_cols=["yearkey"] if name == "fact_ratings" else None,
            )
        for name in MART_TABLES:
            write_parquet(tables[name], str(pathlib.Path(args.marts_dir) / name))
        print(f"[done] dw -> {args.dw_dir}, marts -> {args.marts_dir}")
    finally:
        wh.close()
        spark.stop()


if __name__ == "__main__":
    main()
