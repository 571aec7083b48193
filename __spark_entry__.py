"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps every implemented operator/query from SURVEY.md §2 to a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the DuckDB
equivalent the driver hash-matches against at sf=0.01.

The real tables live in pipeline_pyspark_etl_imdb_spark.plans.registry
(query surface) and .plans.oracles (ANSI-SQL semantics); this module is a
thin adapter so the driver's import surface stays stable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pipeline_pyspark_etl_imdb_spark.plans import analytics
from pipeline_pyspark_etl_imdb_spark.plans.oracles import ORACLES
from pipeline_pyspark_etl_imdb_spark.plans.registry import QUERIES, ROWS_ONLY

# Queries intentionally lacking a SQL oracle (rows-only check by driver).
ROWS_ONLY_QUERIES: tuple[str, ...] = ROWS_ONLY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: five-table star join with broadcast dims at sf0.001."""
    return analytics.region_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return {name: ORACLES[name] for name in QUERIES if name in ORACLES}
