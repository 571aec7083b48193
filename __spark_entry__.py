"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps every implemented operator/query from SURVEY.md §2 to a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the DuckDB
equivalent the driver hash-matches against at sf=0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pipeline_pyspark_etl_imdb_spark.plans import analytics


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: five-table star join with broadcast dims at sf0.001."""
    return analytics.region_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pricing_summary": analytics.pricing_summary,
        "year_order_kpi": analytics.year_order_kpi,
        "top_orders_per_segment_year": analytics.top_orders_per_segment_year,
        "order_price_histogram": analytics.order_price_histogram,
        "distinct_segments": analytics.distinct_segments,
        "part_type_words": analytics.part_type_words,
        "part_word_bridge": analytics.part_word_bridge,
        "region_revenue": analytics.region_revenue,
        "dedup_lineitem_latest": analytics.dedup_lineitem_latest,
        "null_marker_cast": analytics.null_marker_cast,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "year_order_kpi": """
            SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
                   count(*) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean_price,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
            FROM orders
            GROUP BY 1
            ORDER BY order_year
        """,
        "top_orders_per_segment_year": """
            SELECT c_mktsegment, order_year, o_orderkey, o_totalprice, rk
            FROM (
                SELECT c.c_mktsegment,
                       CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
                       o.o_orderkey, o.o_totalprice,
                       CAST(row_number() OVER (
                           PARTITION BY c.c_mktsegment, year(o.o_orderdate)
                           ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
                       ) AS INTEGER) AS rk
                FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            )
            WHERE rk <= 10
        """,
        "order_price_histogram": """
            SELECT o_orderstatus,
                   floor(o_totalprice / 1000.0) * 1000.0 AS price_bucket,
                   count(*) AS n
            FROM orders
            GROUP BY 1, 2
            ORDER BY o_orderstatus, price_bucket
        """,
        "distinct_segments": """
            SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment
        """,
        "part_type_words": """
            SELECT DISTINCT trim(lower(raw_word)) AS word
            FROM (SELECT unnest(string_split(p_type, ' ')) AS raw_word FROM part)
            WHERE trim(lower(raw_word)) <> ''
            ORDER BY word
        """,
        "part_word_bridge": """
            SELECT DISTINCT p_partkey, trim(lower(raw_word)) AS word
            FROM (SELECT p_partkey, unnest(string_split(p_type, ' ')) AS raw_word FROM part)
            WHERE trim(lower(raw_word)) <> ''
        """,
        "region_revenue": """
            SELECT r.r_name AS region_name,
                   CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
                   count(*) AS n_lineitems
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name
            ORDER BY region_name
        """,
        "dedup_lineitem_latest": """
            SELECT l_orderkey, l_linenumber, l_quantity
            FROM (
                SELECT l_orderkey, l_linenumber, l_quantity,
                       row_number() OVER (
                           PARTITION BY l_orderkey
                           ORDER BY l_shipdate DESC, l_linenumber ASC
                       ) AS rn
                FROM lineitem
            )
            WHERE rn = 1
        """,
        "null_marker_cast": """
            SELECT o_orderkey,
                   CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END AS status_or_null,
                   TRY_CAST(string_split(o_orderpriority, '-')[1] AS INTEGER) AS priority_num,
                   TRY_CAST('not-a-number' AS INTEGER) AS always_null
            FROM orders
            WHERE o_orderkey <= 1000
        """,
    }
