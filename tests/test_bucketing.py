"""Bucketed tables must join without a shuffle: the physical plan for a
same-bucketed equi-join contains no ShuffleExchange, and results match the
plain join."""

import pytest
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.sources.bucketing import (
    join_bucketed,
    write_bucketed,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # warehouse dir is a static conf set by get_spark (SPARK_GRAFT_WAREHOUSE)
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(lineitem, "lineitem_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    # at fixture scale Catalyst prefers broadcast (and rightly disables the
    # bucketed read); force the sort-merge path the bucketing exists for —
    # at 100 TB neither side would broadcast
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = join_bucketed(spark, left, right, ["o_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    n_bucketed = join_bucketed(spark, left, right, ["o_orderkey"]).count()
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    n_plain = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey, "inner"
    ).count()
    assert n_bucketed == n_plain


def test_bucketed_agg_has_no_shuffle(spark, bucketed_tables):
    # aggregation on the bucket key also reuses the bucketing layout
    _, right = bucketed_tables
    agg = spark.table(right).groupBy("o_orderkey").agg(F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
