"""Fixture-table registry for the driver's synthetic warehouse.

The driver generates the TPC-H-ish tables listed in TESTDATA.md at
/root/testdata/sf{0.001,0.01,0.1}/<name>.parquet. ``load_tables`` reads
them and (optionally) registers temp views so both the DataFrame API and
spark.sql can address them by name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = FIXTURE_TABLES,
    *,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}
    for name in names:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
