"""Skew utilities and range join: equivalence with the plain operators on
small frames (the oracle suite proves it on fixture data; these pin edge
cases — left join nulls, intervals spanning many bins, inclusive bounds)."""

from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.rangejoin import range_join
from pipeline_pyspark_etl_imdb_spark.operators.skew import salted_agg, salted_join


def test_salted_agg_equals_plain(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(100)] + [("b", i) for i in range(7)], "k string, x int"
    )
    got = {
        r.k: (r.n, r.tot)
        for r in salted_agg(
            df, ["k"], {"n": (F.count("*"), F.sum("n")), "tot": (F.sum("x"), F.sum("tot"))}
        ).collect()
    }
    assert got == {"a": (100, sum(range(100))), "b": (7, sum(range(7)))}


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "k int, v string")
    small = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, w double")
    got = {r.k: r.w for r in salted_join(big, small, "k", how="left").collect()}
    assert got == {1: 10.0, 2: 20.0, 3: None}


def test_salted_join_no_duplicate_rows(spark):
    big = spark.createDataFrame([(1, i) for i in range(50)], "k int, i int")
    small = spark.createDataFrame([(1, "only")], "k int, tag string")
    assert salted_join(big, small, "k", n_salts=8).count() == 50


def test_range_join_inclusive_bounds_and_multibin(spark):
    points = spark.createDataFrame(
        [(1, 0), (2, 10), (3, 25), (4, 99), (5, 100), (6, 101)], "pid int, t long"
    )
    # interval [10, 100] spans many bins at bin_width=10; bounds inclusive
    intervals = spark.createDataFrame([(7, 10, 100)], "iid int, lo long, hi long")
    got = sorted(
        r.pid
        for r in range_join(points, intervals, "t", "lo", "hi", bin_width=10).collect()
    )
    assert got == [2, 3, 4, 5]


def test_range_join_with_keys(spark):
    points = spark.createDataFrame([("g1", 5), ("g2", 5)], "grp string, t long")
    intervals = spark.createDataFrame([("g1", 0, 10)], "grp string, lo long, hi long")
    out = range_join(points, intervals, "t", "lo", "hi", bin_width=10, keys=["grp"])
    assert [r.grp for r in out.collect()] == ["g1"]
