"""as-of join semantics on hand-built rows: backward match, tie
inclusivity, no-match nulls, tolerance cutoff, per-group isolation."""

from pipeline_pyspark_etl_imdb_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 205, "b"), (1, 300, "c"), (2, 150, "d"), (3, 50, "e")],
        "grp int, t long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 90, 9.0), (1, 205, 20.5), (1, 210, 21.0), (2, 10, 1.0)],
        "grp int, t long, v double",
    )
    return left, right


def test_backward_match_and_ties(spark):
    left, right = _frames(spark)
    out = {
        (r.grp, r.tag): (r.v, r.matched_on)
        for r in asof_join(left, right, on="t", by="grp").collect()
    }
    assert out[(1, "a")] == (9.0, 90)  # strictly-before match
    assert out[(1, "b")] == (20.5, 205)  # tie: simultaneous right row visible
    assert out[(1, "c")] == (21.0, 210)  # latest of several
    assert out[(2, "d")] == (1.0, 10)  # groups don't leak
    assert out[(3, "e")] == (None, None)  # no right rows in group


def test_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    out = {
        (r.grp, r.tag): (r.v, r.matched_on)
        for r in asof_join(left, right, on="t", by="grp", tolerance=50).collect()
    }
    assert out[(1, "a")] == (9.0, 90)  # 10 back, within 50
    assert out[(2, "d")] == (None, None)  # 140 back -> stale
    assert out[(1, "c")] == (None, None)  # 90 back -> stale
    assert out[(1, "b")] == (20.5, 205)  # tie, distance 0


def test_null_field_in_matched_row_stays_null(spark):
    # a NULL field in the matched right row must NOT backfill from an
    # older right row (atomic row semantics, as pandas/DuckDB)
    left = spark.createDataFrame([(1, 10)], "grp int, t long")
    right = spark.createDataFrame(
        [(1, 1, 10.0), (1, 8, None)], "grp int, t long, v double"
    )
    row = asof_join(left, right, on="t", by="grp").collect()[0]
    assert row.matched_on == 8 and row.v is None


def test_tie_col_picks_deterministic_right_row(spark):
    left = spark.createDataFrame([(1, 10)], "grp int, t long")
    right = spark.createDataFrame(
        [(1, 5, 100.0, 1), (1, 5, 200.0, 2)], "grp int, t long, v double, seq int"
    )
    row = asof_join(
        left, right, on="t", by="grp", value_cols=["v"], tie_col="seq"
    ).collect()[0]
    assert row.v == 200.0  # greatest seq wins


def test_left_columns_carried(spark):
    left, right = _frames(spark)
    cols = set(asof_join(left, right, on="t", by="grp").columns)
    assert cols == {"grp", "t", "tag", "v", "matched_on"}
