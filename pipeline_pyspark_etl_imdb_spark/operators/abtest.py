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


def srm_check(events: DataFrame, salt: str = "exp1") -> DataFrame:
    """Sample-ratio-mismatch gate (the first thing any experiment
    readout must pass): chi-square of the observed per-variant user
    counts against the designed 50/50 split, with the Wilson-Hilferty
    cube-root normal approximation of the chi-square tail so the alarm
    threshold is a plain z cut — no incomplete-gamma CDF in either
    engine. Flags at z > 3.0902 (one-sided p < 0.001, the industry SRM
    convention: an imbalanced denominator invalidates the experiment
    before any metric is read).

    One row: n_a, n_b, chisq (df=1), wh_z, srm_flag. Exactness: counts
    are integers off one distinct-user aggregate; chisq and wh_z are
    fixed-order double arithmetic on the 2 counts. Shape: one
    partial-agg distinct + a 1-row fold — nothing data-sized moves."""
    counts = ab_assignment(events, salt).agg(
        F.sum(F.when(F.col("variant") == "A", 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == "B", 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
    )
    n = (F.col("n_a") + F.col("n_b")).cast("double")
    exp = n / F.lit(2.0)
    chisq = (
        (F.col("n_a").cast("double") - exp) * (F.col("n_a").cast("double") - exp)
        / exp
        + (F.col("n_b").cast("double") - exp) * (F.col("n_b").cast("double") - exp)
        / exp
    )
    # Wilson-Hilferty: (chi2/df)^(1/3) ~ N(1 - 2/(9 df), 2/(9 df)), df=1
    wh_z = (
        F.pow(chisq, F.lit(1.0 / 3.0)) - (F.lit(1.0) - F.lit(2.0 / 9.0))
    ) / F.sqrt(F.lit(2.0 / 9.0))
    return counts.select(
        "n_a",
        "n_b",
        chisq.alias("chisq"),
        wh_z.alias("wh_z"),
        (wh_z > F.lit(3.0902)).alias("srm_flag"),
    )


def power_mde_report(events: DataFrame, salt: str = "exp1") -> DataFrame:
    """Post-hoc sensitivity of the experiment: the minimum detectable
    effect on the per-user value-sum metric at alpha=0.05 two-sided and
    80% power — MDE = (1.96 + 0.8416) * sqrt(var_a/n_a + var_b/n_b) —
    the closed-form answer to "could this experiment even have seen the
    lift we care about?".

    One row: per-variant n / mean / variance (population form, matching
    the pooled-moment convention of cuped_report), mde_abs, mde_rel
    (vs the A mean). Exactness: per-user sums are DECIMAL; the moment
    sums aggregate the population-sized per-user frame in fixed order.
    Shape: one partial-agg groupBy(user) + a 1-row variant fold."""
    events = events.where(F.col("user_id").isNotNull())
    per_user = (
        events.groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("m")
        )
        .join(F.broadcast(ab_assignment(events, salt=salt)), "user_id")
    )
    v = per_user.agg(
        F.sum(F.when(F.col("variant") == "A", 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == "B", 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("variant") == "A", F.col("m"))).alias("s_a"),
        F.sum(F.when(F.col("variant") == "B", F.col("m"))).alias("s_b"),
        F.sum(F.when(F.col("variant") == "A", F.col("m") * F.col("m"))).alias(
            "ss_a"
        ),
        F.sum(F.when(F.col("variant") == "B", F.col("m") * F.col("m"))).alias(
            "ss_b"
        ),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    mean_a = F.col("s_a") / na
    mean_b = F.col("s_b") / nb
    var_a = F.col("ss_a") / na - mean_a * mean_a
    var_b = F.col("ss_b") / nb - mean_b * mean_b
    mde = F.lit(1.96 + 0.8416) * F.sqrt(var_a / na + var_b / nb)
    return v.select(
        "n_a",
        "n_b",
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        var_a.alias("var_a"),
        var_b.alias("var_b"),
        mde.alias("mde_abs"),
        (mde / mean_a).alias("mde_rel"),
    )


def did_report(orders: DataFrame, salt: str = "did1") -> DataFrame:
    """Difference-in-differences over the order history: units are
    customers (md5-parity treatment assignment, same growth-stable
    device as ab_assignment), periods split at the midpoint of the
    observed o_orderdate range (deterministic from the data), metric is
    the per-customer revenue sum in each period (customers with no
    orders in a period contribute 0, not NULL — the panel is balanced
    by construction). The estimator is the mean of per-customer
    (post - pre) deltas, treatment minus control, with the two-sample
    SE from the per-customer delta variances — the standard parallel-
    trends readout.

    One row: n per group, the four cell means, did estimate, se_did,
    t_stat. Exactness: per-customer per-period sums are DECIMAL over
    integer cents; moments fold the customer-sized frame in fixed
    order. Shape: one range aggregate (1 row, broadcast) + one
    partial-agg groupBy(custkey) + a 1-row fold."""
    # o_orderdate arrives as a timestamp in the fixtures; the period cut
    # is a DATE so both engines compare whole days, not microseconds
    orders = orders.withColumn("__d", F.to_date("o_orderdate"))
    rng = orders.agg(
        F.min("__d").alias("__lo"), F.max("__d").alias("__hi")
    )
    mid = F.date_add(
        F.col("__lo"), (F.datediff(F.col("__hi"), F.col("__lo")) / 2).cast("int")
    )
    per_cust = (
        orders.crossJoin(F.broadcast(rng))
        .withColumn("__mid", mid)
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.when(
                    F.col("__d") < F.col("__mid"),
                    F.col("o_totalprice").cast("decimal(18,2)"),
                ).otherwise(F.lit(0).cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("pre"),
            F.sum(
                F.when(
                    F.col("__d") >= F.col("__mid"),
                    F.col("o_totalprice").cast("decimal(18,2)"),
                ).otherwise(F.lit(0).cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("post"),
        )
        .withColumn(
            "treated",
            _hex_int(
                F.concat(F.col("o_custkey").cast("string"), F.lit(":" + salt))
            )
            % 2
            == 0,
        )
        .withColumn("d", F.col("post") - F.col("pre"))
    )
    v = per_cust.agg(
        F.sum(F.when(F.col("treated"), 1).otherwise(0)).cast("bigint").alias("n_t"),
        F.sum(F.when(~F.col("treated"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_c"),
        F.sum(F.when(F.col("treated"), F.col("pre"))).alias("sp_t"),
        F.sum(F.when(F.col("treated"), F.col("post"))).alias("so_t"),
        F.sum(F.when(~F.col("treated"), F.col("pre"))).alias("sp_c"),
        F.sum(F.when(~F.col("treated"), F.col("post"))).alias("so_c"),
        F.sum(F.when(F.col("treated"), F.col("d"))).alias("sd_t"),
        F.sum(F.when(~F.col("treated"), F.col("d"))).alias("sd_c"),
        F.sum(F.when(F.col("treated"), F.col("d") * F.col("d"))).alias("sdd_t"),
        F.sum(F.when(~F.col("treated"), F.col("d") * F.col("d"))).alias("sdd_c"),
    )
    nt = F.col("n_t").cast("double")
    nc = F.col("n_c").cast("double")
    mean_d_t = F.col("sd_t") / nt
    mean_d_c = F.col("sd_c") / nc
    # sample (n-1) variance of the per-customer deltas
    var_d_t = (F.col("sdd_t") - F.col("sd_t") * F.col("sd_t") / nt) / (
        nt - F.lit(1.0)
    )
    var_d_c = (F.col("sdd_c") - F.col("sd_c") * F.col("sd_c") / nc) / (
        nc - F.lit(1.0)
    )
    did = mean_d_t - mean_d_c
    se = F.sqrt(var_d_t / nt + var_d_c / nc)
    return v.select(
        "n_t",
        "n_c",
        (F.col("sp_t") / nt).alias("pre_mean_t"),
        (F.col("so_t") / nt).alias("post_mean_t"),
        (F.col("sp_c") / nc).alias("pre_mean_c"),
        (F.col("so_c") / nc).alias("post_mean_c"),
        did.alias("did_estimate"),
        se.alias("se_did"),
        (did / se).alias("t_stat"),
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
