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


def cuped_report(events: DataFrame, salt: str = "exp1") -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013, the industry-standard
    experiment-sensitivity technique): adjust each user's post-period
    metric Y by their PRE-period covariate X — Y' = Y - theta (X - mean
    X) with theta = cov(X,Y)/var(X) — so between-user variance that
    existed before the experiment can't drown the treatment effect. The
    pre/post cutover is the midpoint of the observed time range
    (deterministic from the data, integer-µs arithmetic); X and Y are
    per-user value sums, variants are the md5 assignment.

    One-row report: user count, theta, per-variant raw and adjusted
    means, both deltas (B - A), and the achieved variance reduction —
    which at the optimal theta equals corr(X,Y)², reported from the
    moment sums directly (no second pass over adjusted values).

    Exactness: the event-count-sized summations (per-user X, Y) are
    DECIMAL-exact (order-independent); pooled and per-variant moments
    aggregate the per-USER frame — population-sized, not event-sized —
    and feed fixed-order double expressions. Shape: one partial-agg
    groupBy(user) + two one-row aggregates broadcast together; the
    time-range frame is one row, cross-joined before the scan aggregate."""
    # NULL user_id rows are excluded up front: they cannot receive a
    # variant (the assignment join is null-unsafe) and silently vanishing
    # from the moments would diverge from any external replication
    events = events.where(F.col("user_id").isNotNull())
    us = ts_micros(events, "ts")
    rng = events.agg(
        F.min(us).alias("__lo"), F.max(us).alias("__hi")
    )
    base = events.select(F.col("user_id"), us.alias("__us"), F.col("value"))
    mid = ((F.col("__lo") + F.col("__hi")) / 2).cast("bigint")
    per_user = (
        base.crossJoin(F.broadcast(rng))
        .withColumn("__mid", mid)
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("__us") < F.col("__mid"), F.col("value")).otherwise(0.0)
                .cast("decimal(18,6)")
            ).cast("double").alias("x"),
            F.sum(
                F.when(F.col("__us") >= F.col("__mid"), F.col("value")).otherwise(0.0)
                .cast("decimal(18,6)")
            ).cast("double").alias("y"),
        )
        .join(F.broadcast(ab_assignment(events, salt=salt)), "user_id")
    )
    pooled = per_user.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    byv = per_user.groupBy().agg(
        F.sum(F.when(F.col("variant") == "A", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("variant") == "B", 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("variant") == "A", F.col("x"))).alias("sx_a"),
        F.sum(F.when(F.col("variant") == "B", F.col("x"))).alias("sx_b"),
        F.sum(F.when(F.col("variant") == "A", F.col("y"))).alias("sy_a"),
        F.sum(F.when(F.col("variant") == "B", F.col("y"))).alias("sy_b"),
    )
    j = pooled.crossJoin(F.broadcast(byv))
    n = F.col("n").cast("double")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / n
    var_x = F.col("sxx") - F.col("sx") * F.col("sx") / n
    var_y = F.col("syy") - F.col("sy") * F.col("sy") / n
    # degenerate pre-period (all X equal): no covariate signal exists;
    # theta = 0 reduces CUPED to the raw comparison instead of NaN
    theta = F.when(var_x > 0, cov / var_x).otherwise(F.lit(0.0))
    mean_x = F.col("sx") / n
    mean_y_a = F.col("sy_a") / F.col("n_a")
    mean_y_b = F.col("sy_b") / F.col("n_b")
    cuped_a = mean_y_a - theta * (F.col("sx_a") / F.col("n_a") - mean_x)
    cuped_b = mean_y_b - theta * (F.col("sx_b") / F.col("n_b") - mean_x)
    return j.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        theta.alias("theta"),
        mean_y_a.alias("mean_y_a"),
        mean_y_b.alias("mean_y_b"),
        cuped_a.alias("cuped_mean_a"),
        cuped_b.alias("cuped_mean_b"),
        (mean_y_b - mean_y_a).alias("delta_raw"),
        (cuped_b - cuped_a).alias("delta_cuped"),
        F.when(var_x * var_y > 0, (cov * cov) / (var_x * var_y))
        .otherwise(F.lit(0.0))
        .alias("variance_reduction"),
    )
