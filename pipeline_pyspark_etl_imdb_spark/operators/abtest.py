"""Experimentation analytics: deterministic hash-bucketed A/B
assignment with a two-proportion z-test, and the funnel
time-to-convert distribution — the measurement half of every
data-pipeline change (ship the new dedup threshold to bucket B, read
this report). Extends the reference's aggregate family (SURVEY.md §2
A1/A6; reference parity src/etl_imdb.py:214-260) with inference-shaped
outputs.

Assignment is md5-bucketed (same growth-stable device as
corpus.dataset_split / shard_assignment): variant(u) never changes as
the population grows, and both engines compute the identical bucket.

Exactness: counts are integers; rates, lift, and the z statistic are
fixed-order double expressions over DECIMAL-exact sums — oracle-backed,
no RNG anywhere.

Shape: ONE partial-aggregated groupBy(user) collapses the event stream
to per-user flags, then a 2-row variant rollup; the z-test is driver-
free arithmetic on the 2-row frame (cross join of two 1-row aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.eventtime import ts_micros


def _hex_int(col: F.Column) -> F.Column:
    # first 8 hex chars of md5 as a bigint — uniform in [0, 2^32)
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def ab_assignment(events: DataFrame, salt: str = "exp1") -> DataFrame:
    """(user_id, variant): 'A'/'B' by md5(user || ':' || salt) parity."""
    users = events.select("user_id").distinct()
    bucket = _hex_int(F.concat(F.col("user_id").cast("string"), F.lit(":" + salt)))
    return users.select(
        "user_id",
        F.when(bucket % 2 == 0, F.lit("A")).otherwise(F.lit("B")).alias("variant"),
    )


def ab_experiment_report(
    events: DataFrame, salt: str = "exp1", min_purchases: int = 14
) -> DataFrame:
    """One-row report: per-variant user counts, conversion (at least
    ``min_purchases`` purchase events — a thresholded engagement metric,
    so the fixture's rates sit mid-range instead of saturating at 1.0),
    conversion rates, relative lift, and the pooled two-proportion z
    statistic for rate_b - rate_a."""
    per_user = (
        events.groupBy("user_id")
        .agg(
            F.when(
                F.sum(
                    F.when(F.col("event_type") == "purchase", F.lit(1)).otherwise(
                        F.lit(0)
                    )
                )
                >= min_purchases,
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("converted")
        )
    )
    assigned = per_user.join(ab_assignment(events, salt), "user_id")
    var = assigned.groupBy("variant").agg(
        F.count("*").alias("n"), F.sum("converted").alias("conv")
    )
    a = var.where(F.col("variant") == "A").select(
        F.col("n").alias("n_a"), F.col("conv").alias("conv_a")
    )
    b = var.where(F.col("variant") == "B").select(
        F.col("n").alias("n_b"), F.col("conv").alias("conv_b")
    )
    j = a.crossJoin(b)
    rate_a = F.col("conv_a").cast("double") / F.col("n_a")
    rate_b = F.col("conv_b").cast("double") / F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    se = F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    return j.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        rate_a.alias("rate_a"),
        rate_b.alias("rate_b"),
        ((rate_b - rate_a) / rate_a).alias("rel_lift"),
        ((rate_b - rate_a) / se).alias("z_score"),
    )


def time_to_convert(events: DataFrame) -> DataFrame:
    """One-row funnel-latency report: for users whose first 'view'
    precedes their first 'purchase', seconds between the two — count,
    DECIMAL-exact mean, exact interpolated p50/p90 (the percentile
    parity contract established by value_percentile_bands)."""
    us = ts_micros(events)
    per_user = (
        events.select("user_id", "event_type", us.alias("us"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("us"))).alias(
                "first_view"
            ),
            F.min(F.when(F.col("event_type") == "purchase", F.col("us"))).alias(
                "first_purchase"
            ),
        )
        .where(
            F.col("first_view").isNotNull()
            & F.col("first_purchase").isNotNull()
            & (F.col("first_view") < F.col("first_purchase"))
        )
        .select(
            (
                (F.col("first_purchase") - F.col("first_view")).cast("double")
                / 1e6
            ).alias("latency_s")
        )
    )
    return per_user.agg(
        F.count("*").alias("n_converted"),
        (
            F.sum(F.col("latency_s").cast("decimal(28,12)")).cast("double")
            / F.count("*")
        ).alias("mean_s"),
        F.expr("percentile(latency_s, 0.5)").alias("p50_s"),
        F.expr("percentile(latency_s, 0.9)").alias("p90_s"),
    )
