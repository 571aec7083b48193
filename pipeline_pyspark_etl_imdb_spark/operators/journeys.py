"""User-journey analytics over the events table: ordered funnels, cohort
retention, and inter-arrival gaps.

The reference has no behavioral-analytics surface at all (SURVEY.md §2 —
it is a static star-schema builder); these are the product-analytics
queries every event warehouse runs, and each is shaped for 100 TB:

- ``funnel``          — ordered multi-step conversion. ONE shuffle
  (groupBy user) + an in-array fold: the per-user event list is bounded
  (events per user, not corpus size), and the fold is a built-in
  ``aggregate`` expression — no Python, no per-step self-join cascade
  (k-step funnels as k joins shuffle the events table k times; the fold
  shuffles it once).
- ``cohort_retention`` — classic (cohort x offset) activity triangle.
  Two key-partitioned aggregations and one equi-join on user_id.
- ``inter_arrival``    — per-user gap statistics via one partitioned lag
  window (the burstiness signal feeding rate-limit/bot filtering).

Timestamps flow as integer epoch microseconds (eventtime.ts_micros), so
every comparison is exact integer arithmetic that any engine reproduces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.eventtime import US, ts_micros


def funnel(
    events: DataFrame,
    steps: tuple[str, ...],
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: a user reaches step k when an event of type
    ``steps[k]`` occurs STRICTLY AFTER the event that reached step k-1.
    Returns one row per step: (step_idx 1-based, step, n_users reached).

    Physical shape: filter to the step types (pushed into the scan),
    one groupBy(user) collecting the time-sorted event list, then a
    built-in ``aggregate`` fold that walks the list once carrying
    (depth, last_reach_time). Equivalent to the k-fold cascading
    min-join formulation (first matching event after t_{k-1} IS the
    minimum, because the list is sorted) but with one shuffle instead
    of k."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    n = len(steps)
    steps_sql = "array(" + ", ".join(f"'{s}'" for s in steps) + ")"
    ev = events.where(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("step"),
        ts_micros(events).alias("us"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("us", "step"))).alias("evs")
    )
    depth = F.expr(
        f"""aggregate(
            evs,
            named_struct('d', 0, 't', CAST(-1 AS BIGINT)),
            (acc, e) -> IF(
                acc.d < {n}
                AND e.step = element_at({steps_sql}, acc.d + 1)
                AND e.us > acc.t,
                named_struct('d', acc.d + 1, 't', e.us),
                acc),
            acc -> acc.d)"""
    )
    reached = (
        per_user.select(depth.alias("depth"))
        .where(F.col("depth") > 0)
        .select(F.explode(F.sequence(F.lit(1), F.col("depth"))).alias("step_idx"))
    )
    return (
        reached.groupBy("step_idx")
        .agg(F.count("*").alias("n_users"))
        .select(
            F.col("step_idx").cast("int").alias("step_idx"),
            F.expr(f"element_at({steps_sql}, step_idx)").alias("step"),
            "n_users",
        )
        .orderBy("step_idx")
    )


def cohort_retention(
    events: DataFrame,
    bucket_s: int = 604_800,
    user_col: str = "user_id",
) -> DataFrame:
    """Cohort retention triangle: users bucketed by their first-activity
    window; for every (cohort, offset) the count of cohort members active
    ``offset`` buckets later, plus the share of the cohort that is
    (offset 0 is the cohort itself, retention 1.0).

    Buckets are exact integer ``div`` on epoch microseconds — no
    float rounding at bucket edges. Shapes: first-activity is one
    partially-aggregated groupBy(user); activity distinct is another;
    the join is user-keyed equi (co-partitioned with AQE); the final
    window runs over the already-tiny (cohort, offset) aggregate."""
    bucket_us = bucket_s * US
    base = events.select(
        F.col(user_col).alias("user_id"), ts_micros(events).alias("us")
    ).select("user_id", F.expr(f"us div {bucket_us}").alias("bucket"))
    first = base.groupBy("user_id").agg(F.min("bucket").alias("cohort_bucket"))
    activity = base.distinct()
    joined = activity.join(first, "user_id").select(
        "cohort_bucket",
        (F.col("bucket") - F.col("cohort_bucket")).alias("bucket_offset"),
    )
    counts = joined.groupBy("cohort_bucket", "bucket_offset").agg(
        F.count("*").alias("n_users")
    )
    w = Window.partitionBy("cohort_bucket")
    cohort_size = F.max(
        F.when(F.col("bucket_offset") == 0, F.col("n_users"))
    ).over(w)
    return counts.select(
        "cohort_bucket",
        "bucket_offset",
        "n_users",
        (F.col("n_users").cast("double") / cohort_size).alias("retention"),
    ).orderBy("cohort_bucket", "bucket_offset")


def inter_arrival(
    events: DataFrame,
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user inter-arrival statistics: number of events, number of
    gaps, mean and max gap in seconds. One lag window partitioned by
    user (total order via (ts, event_id)), one groupBy — a single
    user-keyed shuffle end to end. Gaps accumulate as exact integer
    microseconds; the only float op is the final division, written
    identically in the oracle."""
    w = Window.partitionBy("user_id").orderBy("us", id_col)
    gaps = events.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col),
        ts_micros(events).alias("us"),
    ).withColumn("gap_us", F.col("us") - F.lag("us").over(w))
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.count("gap_us").alias("n_gaps"),
            F.sum("gap_us").alias("__sum_gap_us"),
            F.max("gap_us").alias("__max_gap_us"),
        )
        .select(
            "user_id",
            "n_events",
            "n_gaps",
            # explicit NULL for gap-less (single-event) users: engines
            # disagree on float division by zero, so never emit one
            F.when(
                F.col("n_gaps") > 0,
                F.col("__sum_gap_us").cast("double") / F.col("n_gaps") / 1e6,
            ).alias("avg_gap_s"),
            (F.col("__max_gap_us").cast("double") / 1e6).alias("max_gap_s"),
        )
    )


def type_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts between consecutive event
    types per user: (from_type, to_type, n_transitions, share).

    Shape: ONE user-keyed lag window (total order via (ts, event_id))
    then a tiny (|types|^2-bounded) groupBy — the aggregate is partial,
    so the second shuffle moves at most types^2 rows per partition.
    ``share`` normalizes each row over its from_type fan-out (row
    probability of the transition matrix)."""
    w = Window.partitionBy("user_id").orderBy("us", id_col)
    pairs = (
        events.select(
            F.col(user_col).alias("user_id"),
            F.col(id_col),
            F.col(type_col).alias("to_type"),
            ts_micros(events).alias("us"),
        )
        .withColumn("from_type", F.lag("to_type").over(w))
        .where(F.col("from_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_transitions")
    )
    wt = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(wt)
        ).alias("share"),
    ).orderBy("from_type", "to_type")


def session_top_paths(
    events: DataFrame,
    gap_s: int = 1800,
    top: int = 50,
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Most frequent within-session journey paths: sessionize (same lag +
    running-sum pattern as eventtime.sessionize), render each session as
    an ordered ``a>b>c`` path string, count path frequencies, keep the
    global top ``top``.

    The ordered concatenation is collect_list -> array_sort over
    (us, event_id, type) structs -> transform to the type field — a
    DETERMINISTIC ordered aggregation (bare collect_list order is
    partition-dependent; the struct sort pins it). Per-session state is
    events-per-session bounded; the path table aggregate is partial, and
    the final top-N plans as TakeOrderedAndProject (per-partition top-N
    merged at the driver — no global sort)."""
    w = Window.partitionBy("user_id").orderBy("us", id_col)
    flagged = (
        events.select(
            F.col(user_col).alias("user_id"),
            F.col(id_col),
            F.col(type_col).alias("etype"),
            ts_micros(events).alias("us"),
        )
        .withColumn("prev_us", F.lag("us").over(w))
        .withColumn(
            "new_session",
            F.when(
                F.col("prev_us").isNull()
                | (F.col("us") - F.col("prev_us") > gap_s * US),
                1,
            ).otherwise(0),
        )
        .withColumn("session_idx", F.sum("new_session").over(w))
    )
    paths = flagged.groupBy("user_id", "session_idx").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("us", F.col(id_col), "etype"))
                ),
                lambda s: s["etype"],
            ),
            ">",
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(F.count("*").alias("n_sessions"))
    return (
        counts.orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(top)
        .select("path", "n_sessions")
    )


def type_kgrams(
    events: DataFrame,
    k: int = 3,
    top: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Top-``top`` most frequent k-grams of consecutive event types per
    user sequence — the order-k generalization of type_transitions
    (sequential-pattern mining, the frequency table behind behavioral
    n-gram features). Output (kgram, n_occurrences), count desc.

    Shape: ONE user-keyed window provides the k-1 leads (same Exchange
    serves all of them), k-grams that would cross a user boundary are
    dropped by the lead NULL checks, and the global top compiles to
    TakeOrderedAndProject — per-partition top-N, no global sort. The
    groupBy is partial-aggregated; the shuffle moves at most
    |types|^k rows per partition (|types| is small by construction)."""
    w = Window.partitionBy("user_id").orderBy("us", id_col)
    base = events.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col),
        F.col(type_col).alias("t0"),
        ts_micros(events).alias("us"),
    )
    for i in range(1, k):
        base = base.withColumn(f"t{i}", F.lead("t0", i).over(w))
    cond = None
    for i in range(1, k):
        c = F.col(f"t{i}").isNotNull()
        cond = c if cond is None else (cond & c)
    full = base.where(cond) if cond is not None else base
    kgram = F.concat_ws(">", *[F.col(f"t{i}") for i in range(k)])
    return (
        full.select(kgram.alias("kgram"))
        .groupBy("kgram")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("kgram"))
        .limit(top)
    )


def markov_entropy_rate(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """One-row empirical entropy rate of the first-order event-type
    Markov chain — H = -sum_ij (n_ij / N) ln(n_ij / n_i.) — the
    predictability ceiling of user behavior (ln|types| = uniform noise,
    0 = deterministic loops; the number a sequence model's loss is
    bounded by). Reported with the normalized ratio against ln(n_states).

    Shape: the same ONE user-keyed lag window as type_transitions, a
    |types|^2-bounded transition groupBy, a PARTITIONED from-type
    marginal window, and a constant-size fold — no partition-less window
    anywhere (the total arrives by broadcast cross join)."""
    w = Window.partitionBy("user_id").orderBy("us", id_col)
    pairs = (
        events.select(
            F.col(user_col).alias("user_id"),
            F.col(id_col),
            F.col(type_col).alias("to_type"),
            ts_micros(events).alias("us"),
        )
        .withColumn("from_type", F.lag("to_type").over(w))
        .where(F.col("from_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").cast("bigint").alias("n")
    )
    wt = Window.partitionBy("from_type")
    with_marg = counts.withColumn("n_from", F.sum("n").over(wt))
    # "__total", not "N": Spark resolves case-insensitively by default,
    # so an "N" column would collide with the per-transition "n"
    tot = with_marg.agg(
        F.sum("n").cast("bigint").alias("__total"),
        F.countDistinct("from_type").cast("bigint").alias("n_states"),
    )
    j = with_marg.crossJoin(F.broadcast(tot))
    term = (
        F.col("n").cast("double") / F.col("__total").cast("double")
    ) * F.log(F.col("n").cast("double") / F.col("n_from").cast("double"))
    return j.agg(
        F.first("__total").alias("n_transitions"),
        F.first("n_states").alias("n_states"),
        (-F.sum(term)).alias("entropy_rate_nats"),
        (
            -F.sum(term)
            / F.log(F.first("n_states").cast("double"))
        ).alias("normalized_entropy"),
    )


def user_burstiness(
    events: DataFrame,
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """One-row Goh-Barabasi burstiness summary of per-user inter-arrival
    times: B = (sigma - mu) / (sigma + mu) per user (population sigma
    over the user's gaps), -1 = clockwork, 0 = Poisson, ->1 = bursty.
    The activity-pattern diagnostic that decides whether rate limits and
    session windows are sized for humans or for schedulers.

    Only users with >= 2 gaps contribute (a single gap has sigma 0 and
    would pin B to -1 by construction, not by behavior). Exactness:
    per-user gap sums in integer microseconds, squared sums in
    DECIMAL(38,0) (a month-long gap squared overflows int64); the
    user-level fold is population-sized doubles, cuped_report's
    convention. Shape: one user-keyed lag window + two partial-agg
    group-bys."""
    w = Window.partitionBy("user_id").orderBy("us", id_col)
    gaps = (
        events.select(
            F.col(user_col).alias("user_id"),
            F.col(id_col),
            ts_micros(events).alias("us"),
        )
        .withColumn("gap", (F.col("us") - F.lag("us").over(w)).cast("bigint"))
        .where(F.col("gap").isNotNull())
    )
    per_user = (
        gaps.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_gaps"),
            F.sum("gap").cast("bigint").alias("s"),
            F.sum(
                F.col("gap").cast("decimal(38,0)")
                * F.col("gap").cast("decimal(38,0)")
            ).alias("ss"),
        )
        .where(F.col("n_gaps") >= 2)
    )
    ng = F.col("n_gaps").cast("double")
    mu = F.col("s").cast("double") / ng
    var = F.col("ss").cast("double") / ng - mu * mu
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    b = (sigma - mu) / (sigma + mu)
    scored = per_user.select(b.alias("b"))
    return scored.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.avg("b").alias("mean_burstiness"),
        F.min("b").alias("min_burstiness"),
        F.max("b").alias("max_burstiness"),
        (
            F.sum(F.when(F.col("b") > 0, 1).otherwise(0)).cast("double")
            / F.count("*")
        ).alias("share_bursty"),
    )
