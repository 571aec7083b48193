"""U-shaped attribution gates: hand-built scenarios for every k regime,
the conservation law (credits sum to total purchase value), and the
plan shape (user-keyed join, no cartesian)."""

import pytest
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.attribution import (
    position_based_attribution,
)
from tests.conftest import SF_SMOKE


def _ev(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string, value double"
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


def test_hand_built_all_k_regimes(spark):
    rows = [
        # user 1: one touch -> 100%
        (1, 1, "view", "2024-01-01 10:00:00", 0.0),
        (2, 1, "purchase", "2024-01-01 12:00:00", 10.0),
        # user 2: two touches -> 50/50
        (3, 2, "view", "2024-01-02 09:00:00", 0.0),
        (4, 2, "click", "2024-01-02 10:00:00", 0.0),
        (5, 2, "purchase", "2024-01-02 11:00:00", 20.0),
        # user 3: four touches -> 40/10/10/40
        (6, 3, "view", "2024-01-03 08:00:00", 0.0),
        (7, 3, "click", "2024-01-03 09:00:00", 0.0),
        (8, 3, "click", "2024-01-03 10:00:00", 0.0),
        (9, 3, "view", "2024-01-03 11:00:00", 0.0),
        (10, 3, "purchase", "2024-01-03 12:00:00", 100.0),
        # user 4: no touches -> direct
        (11, 4, "purchase", "2024-01-04 12:00:00", 7.0),
        # user 5: touch OUTSIDE the 7-day lookback -> direct
        (12, 5, "view", "2024-01-01 00:00:00", 0.0),
        (13, 5, "purchase", "2024-01-20 00:00:00", 3.0),
    ]
    got = {
        r.channel: (r.attributed_value, r.n_credits)
        for r in position_based_attribution(_ev(spark, rows)).collect()
    }
    # view: 10 (u1) + 10 (u2 first) + 40+10 (u3 first + last... u3 view
    # positions: first=view(40), mid click 10, mid click 10, last=view(40))
    assert got["view"][0] == pytest.approx(10.0 + 10.0 + 40.0 + 40.0)
    assert got["click"][0] == pytest.approx(10.0 + 10.0 + 10.0)
    assert got["direct"] == (pytest.approx(10.0), 2)


def test_conservation_on_fixture(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    out = position_based_attribution(events)
    total_attr = out.agg(F.sum("attributed_value")).collect()[0][0]
    total_purch = (
        events.where(F.col("event_type") == "purchase")
        .agg(F.sum("value"))
        .collect()[0][0]
    )
    assert total_attr == pytest.approx(total_purch, rel=1e-9)


def test_plan_user_keyed_join_no_cartesian(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    plan = (
        position_based_attribution(events)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
