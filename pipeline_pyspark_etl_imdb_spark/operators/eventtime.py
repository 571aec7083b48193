"""Batch event-time operators over the events table.

The reference has no time semantics at all (SURVEY.md §2.8); these add the
event-time surface a pipeline needs: tumbling/sliding window KPIs,
sessionization, and JSON property extraction. The streaming (readStream)
counterparts live in ``streaming/``; these batch forms share the window
math.

Window timestamps are computed as integer epoch microseconds -> bigint
window-start seconds (exact integer arithmetic, identical on every
engine) rather than engine-native window types, so results hash-match an
external oracle regardless of timezone/timestamp encodings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

US = 1_000_000


def ts_micros(df: DataFrame, ts_col: str = "ts") -> Column:
    """Epoch microseconds from the event-time column, whatever its storage
    type: TimestampType, TIMESTAMP_NTZ (parquet timestamp[us] with
    isAdjustedToUTC=false), or bigint nanoseconds (how we read parquet
    TIMESTAMP(NANOS), which Spark has no native type for — truncation to
    micros matches what µs-native engines do with the same file)."""
    dtype = dict(df.dtypes).get(ts_col)
    if dtype in ("bigint", "long"):
        # integer `div`, NOT floor(x/1000): epoch nanoseconds (~1.7e18)
        # exceed the 2^53 exact-double range, so double division is off by
        # up to a microsecond
        return F.expr(f"CAST(`{ts_col}` div 1000 AS BIGINT)")
    if dtype == "timestamp_ntz":
        # wall-clock-as-UTC, independent of spark.sql.session.timeZone —
        # a cast to TIMESTAMP would shift by the session zone offset,
        # breaking parity with µs-native engines reading the same file
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{ts_col}`)"
        )
    return F.unix_micros(F.col(ts_col))


def _window_start_s(us: Column, width_s: int, offset_s: int = 0) -> Column:
    w = width_s * US
    return (
        F.floor((us - offset_s * US) / w) * width_s + offset_s
    ).cast("bigint")


def tumbling_kpi(
    events: DataFrame, width_s: int = 600, *, value_as_decimal: bool = False
) -> DataFrame:
    """Per (tumbling window, event_type): event count and value sum.
    Value accumulates in DECIMAL for engine-exact totals; the public
    schema casts to double unless ``value_as_decimal`` — pass True when
    the output feeds further reaggregation (rollup_coarser) so no
    precision is lost at the double boundary."""
    sum_value = F.sum(F.col("value").cast("decimal(18,4)"))
    if not value_as_decimal:
        sum_value = sum_value.cast("double")
    return (
        events.withColumn("window_start_s", _window_start_s(ts_micros(events), width_s))
        .groupBy("window_start_s", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            sum_value.alias("sum_value"),
        )
        .orderBy("window_start_s", "event_type")
    )


def rollup_coarser(
    kpi: DataFrame, finer_width_s: int, coarser_width_s: int
) -> DataFrame:
    """Hierarchical (hypertable-style) rollup: derive a coarser tumbling
    KPI from an already-aggregated finer one instead of rescanning raw
    events. Counts and decimal-safe sums re-aggregate exactly, so a
    10-minute materialization serves hourly/daily queries at 1/width the
    input size — the continuous-aggregate pattern. Requires aligned
    widths (coarser must be a multiple of finer)."""
    if coarser_width_s % finer_width_s != 0:
        raise ValueError(
            f"coarser width {coarser_width_s} must be a multiple of finer "
            f"width {finer_width_s} for exact reaggregation"
        )
    coarse_start = (
        F.floor(F.col("window_start_s") / coarser_width_s) * coarser_width_s
    ).cast("bigint")
    return (
        kpi.withColumn("window_start_s", coarse_start)
        .groupBy("window_start_s", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum(F.col("sum_value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("window_start_s", "event_type")
    )


def sliding_kpi(events: DataFrame, width_s: int = 600, slide_s: int = 300) -> DataFrame:
    """Sliding-window KPI: each event lands in width/slide windows
    (explode over slide offsets — the batch equivalent of F.window(ts,
    width, slide), expressed portably)."""
    n_offsets = width_s // slide_s
    offsets = F.array(*[F.lit(i * slide_s) for i in range(n_offsets)])
    return (
        events.select(ts_micros(events).alias("us"), "event_type", F.explode(offsets).alias("off"))
        .withColumn(
            "window_start_s",
            (
                F.floor((F.col("us") - F.col("off") * US) / (width_s * US)) * width_s
                + F.col("off")
            ).cast("bigint"),
        )
        .groupBy("window_start_s", "event_type")
        .agg(F.count("*").alias("n_events"))
        .orderBy("window_start_s", "event_type")
    )


def sessionize(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Sessionization: per user, a new session starts when the gap from the
    previous event exceeds ``gap_s``. Classic lag + running-sum window
    pattern; deterministic via (ts, event_id) ordering.

    Returns one row per session: user_id, session_idx (1-based per user),
    n_events, start/end epoch seconds.
    """
    order = [F.col("us").asc(), F.col("event_id").asc()]
    w = Window.partitionBy("user_id").orderBy(*order)
    flagged = (
        events.select("user_id", "event_id", ts_micros(events).alias("us"))
        .withColumn("prev_us", F.lag("us").over(w))
        .withColumn(
            "new_session",
            F.when(
                F.col("prev_us").isNull() | (F.col("us") - F.col("prev_us") > gap_s * US), 1
            ).otherwise(0),
        )
        .withColumn("session_idx", F.sum("new_session").over(w))
    )
    return (
        flagged.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.floor(F.min("us") / US).cast("bigint").alias("start_s"),
            F.floor(F.max("us") / US).cast("bigint").alias("end_s"),
        )
        .orderBy("user_id", "session_idx")
    )


def merge_intervals(
    intervals: DataFrame,
    key_col: str = "user_id",
    start_col: str = "start_us",
    end_col: str = "end_us",
) -> DataFrame:
    """Consolidate overlapping/touching intervals per key into maximal
    disjoint spans (the classic interval-union problem: ad sessions,
    machine uptime, coverage windows).

    Shape: ONE shuffle on ``key_col``; within each key a sort + two window
    passes — running max of prior ends decides whether an interval starts a
    new span, a running sum of those flags numbers the spans, and a final
    partial-aggregated groupBy collapses each span. No self-join, no range
    explosion; per-key state is O(1) per row, so a key with 10^9 intervals
    streams through rank-ordered windows without materializing pairs.

    Returns one row per merged span: key, span_idx (1-based per key),
    start/end, n_source (how many raw intervals merged in).
    """
    order = [F.col(start_col).asc(), F.col(end_col).asc()]
    w = Window.partitionBy(key_col).orderBy(*order)
    prior_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = (
        intervals.select(key_col, start_col, end_col)
        .withColumn(
            "new_span",
            F.when(
                prior_max_end.isNull() | (F.col(start_col) > prior_max_end), 1
            ).otherwise(0),
        )
        .withColumn("span_idx", F.sum("new_span").over(w))
    )
    return (
        flagged.groupBy(key_col, "span_idx")
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
            F.count("*").alias("n_source"),
        )
        .orderBy(key_col, "span_idx")
    )


def user_activity_spans(events: DataFrame, hold_s: int = 300) -> DataFrame:
    """Activity spans per user: each event opens a [ts, ts+hold_s] interval;
    overlapping intervals merge into continuous activity spans (equivalent
    to sessionize with gap=hold_s, but expressed via the general
    interval-union operator so both shapes are covered)."""
    us = ts_micros(events)
    iv = events.select(
        "user_id",
        us.alias("start_us"),
        (us + hold_s * US).alias("end_us"),
    )
    merged = merge_intervals(iv)
    return merged.select(
        "user_id",
        F.col("span_idx").cast("bigint").alias("span_idx"),
        F.floor(F.col("start_us") / US).cast("bigint").alias("start_s"),
        F.floor(F.col("end_us") / US).cast("bigint").alias("end_s"),
        F.col("n_source").alias("n_events"),
    )


def json_value_kpi(events: DataFrame) -> DataFrame:
    """Extract an int property from the JSON props column and aggregate per
    event type (JSON path surface; null-safe cast)."""
    k = F.get_json_object(F.col("props"), "$.k").try_cast("int")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.count("k").alias("n_with_k"),
        )
        .orderBy("event_type")
    )


def user_type_pivot(events: DataFrame, event_types: tuple[str, ...] = (
    "click", "error", "purchase", "signup", "view"
)) -> DataFrame:
    """Pivot: events per user per type, one column per type."""
    return (
        events.groupBy("user_id")
        .pivot("event_type", list(event_types))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(event_types))
        .select(
            "user_id", *[F.col(t).cast("bigint").alias(f"n_{t}") for t in event_types]
        )
        .orderBy("user_id")
    )


def grouped_ema(
    df: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("us", "event_id"),
    value_col: str = "value",
    alpha: float = 0.1,
) -> DataFrame:
    """Per-key exponential moving average over time order — a sequential
    recurrence (each state depends on the previous state) that no SQL
    window frame expresses.

    Physical shape: ONE shuffle (repartition on the key) + an in-partition
    sort, then a single ``mapInPandas`` scan with cross-batch carry — one
    Python invocation per Arrow batch, not per group. The per-group
    ``applyInPandas`` alternative dispatches Python once per key (~1-2 ms
    each), which at 100 TB key cardinalities dominates the actual compute;
    the sort-based scan is the same sort-shuffle the grouped API performs
    anyway, minus the per-group dispatch. Completed groups flush with each
    input batch, so Python-side memory holds one open group plus one
    batch's output, independent of partition size.

    NULL values fold as 0.0 (matching the oracle's ``coalesce(value,
    0.0)``); arithmetic is IEEE float64 in arrival order, so the result is
    bit-equal to any engine replaying the same recurrence. Keys are
    assumed non-null (enforce upstream; a null key would need its own
    group semantics).
    """
    import numpy as np
    import pandas as pd

    part = df.repartition(key_col).sortWithinPartitions(key_col, *order_cols)
    one_minus = 1.0 - alpha

    def scan(batches):
        cur = None
        state = None
        n = 0
        for pdf in batches:
            keys = pdf[key_col].to_numpy()
            vals = pdf[value_col].to_numpy(dtype=np.float64, na_value=np.nan)
            out_k: list = []
            out_v: list = []
            out_n: list = []
            for k, x in zip(keys, vals):
                if k != cur:
                    if cur is not None:
                        out_k.append(cur)
                        out_v.append(state)
                        out_n.append(n)
                    cur = k
                    state = None
                    n = 0
                x = 0.0 if x != x else float(x)
                state = x if state is None else alpha * x + one_minus * state
                n += 1
            if out_k:
                yield pd.DataFrame(
                    {key_col: out_k, "ema_value": out_v, "n_events": out_n}
                )
        if cur is not None:
            yield pd.DataFrame({key_col: [cur], "ema_value": [state], "n_events": [n]})

    return part.mapInPandas(
        scan, schema=f"{key_col} bigint, ema_value double, n_events bigint"
    )


def cusum_changepoints(events: DataFrame) -> DataFrame:
    """Per-user CUSUM change-point: the event where the running sum of
    (value - global_mean) peaks in absolute value — Page's classic
    drift detector (Page 1954), the batch form of the streaming z-score
    monitor in streaming/ops.py. Extends the reference's window family
    (SURVEY.md §2 W1-W3; reference parity src/etl_imdb.py:262-276) with
    a running-sum frame.

    Exactness (revised in r4 after an sf0.1 oracle mismatch): a double
    running sum is NOT portable even with the fold order pinned — DuckDB
    evaluates window sums over a segment TREE, so its float association
    differs from a left-to-right fold on most rows. The walk therefore
    stays in DECIMAL end to end: with run_i = Σ_{j<=i} v_j (6-decimal
    quantized, exact) and m_i the running non-null count,
        cusum_i = run_i - m_i * (total / N)
    is ranked by the EXACT integer-scaled score
        score_i = |N * run_i - m_i * total|
    (same argmax, no division), and only the one surviving row per user
    converts to double — via CAST(decimal AS STRING) then strtod, because
    DuckDB's direct decimal->double cast is off by 1 ulp near rounding
    boundaries while strtod is correctly rounded in both engines. The
    declared decimal widths are exact for |value| < 10^4, per-user sums
    < 10^10, and N < 10^12; past that the multiplications overflow to
    NULL (non-ANSI) rather than silently losing precision.

    Physical shape: ONE Exchange on user_id serves both windows and the
    rank filter (same-key windows reuse the partitioning); the global
    (total, N) pair is a 1-row broadcast cross join. Nothing corpus-sized
    moves twice."""
    us = ts_micros(events).alias("us")
    v_dec = F.col("value").cast("decimal(18,6)")
    base = events.select("user_id", "event_id", us, v_dec.alias("__v"))
    totals = base.agg(
        F.sum("__v").cast("decimal(20,6)").alias("__total"),
        F.count("*").cast("decimal(12,0)").alias("__n"),
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = (
        base.crossJoin(F.broadcast(totals))
        .withColumn("__run", F.sum("__v").over(w_cum).cast("decimal(16,6)"))
        .withColumn("__m", F.count("__v").over(w_cum).cast("decimal(12,0)"))
        .withColumn(
            "__score",
            F.abs(
                F.col("__n") * F.col("__run") - F.col("__m") * F.col("__total")
            ),
        )
    )
    w_rank = Window.partitionBy("user_id").orderBy(
        F.desc("__score"), F.asc("us"), F.asc("event_id")
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w_rank))
        .where(F.col("__rk") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("cp_event_id"),
            F.col("us").alias("cp_us"),
            (
                F.col("__score").cast("string").cast("double")
                / F.col("__n").cast("double")
            ).alias("max_abs_cusum"),
        )
    )


def decayed_user_value(events: DataFrame, horizon_days: float = 1.0) -> DataFrame:
    """Hyperbolic time-decayed engagement: sum of value / (1 + age/h)
    per user, age measured back from the corpus max event time — the
    recency-weighted activity score behind freshness-aware sampling.

    Decay is deliberately RATIONAL (1/(1+age)), not exponential: exp()
    may differ by an ulp across libm implementations, while this chain
    (integer age, double divide) is bit-identical cross-engine; each
    term is then cast to DECIMAL(28,12) so the per-user sum is order-
    independent. That is what keeps a float-weighted aggregate
    oracle-backed.

    Shape: 1-row global max broadcast back, then ONE partial-aggregated
    groupBy(user_id) — map-side combine, single shuffle."""
    us = ts_micros(events).alias("us")
    base = events.select("user_id", us, F.col("value"))
    mx = base.agg(F.max("us").alias("__max_us"))
    age_days = (F.col("__max_us") - F.col("us")).cast("double") / (86400.0 * US)
    term = (F.col("value") / (F.lit(1.0) + age_days / F.lit(horizon_days))).cast(
        "decimal(28,12)"
    )
    return (
        base.crossJoin(F.broadcast(mx))
        .select("user_id", term.alias("__t"))
        .groupBy("user_id")
        .agg(
            F.sum("__t").cast("double").alias("decayed_value"),
            F.count("*").alias("n_events"),
        )
    )


def value_percentile_bands(events: DataFrame) -> DataFrame:
    """Per-event-type latency-style bands: n, DECIMAL-exact mean, and
    EXACT interpolated p50/p90/p99 of ``value`` — the tail-health
    report. Spark's percentile() and an ANSI quantile_cont use the same
    linear interpolation on the same sorted values, so even the
    interpolated cut points are bit-identical cross-engine (verified,
    not assumed — the oracle hash-matches them raw).

    Exact percentile is a sort-based aggregate: fine for a bounded group
    count, and the deliberate ORACLE-ABLE twin of the approx_percentile
    path (warehouse.winsorized_stats) that a 100 TB run would use —
    same report schema, sketch instead of sort."""
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            (
                F.sum(F.col("value").cast("decimal(28,12)")).cast("double")
                / F.count("*")
            ).alias("mean_value"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
            F.expr("percentile(value, 0.99)").alias("p99"),
        )
        .orderBy("event_type")
    )


def dow_seasonality(events: DataFrame) -> DataFrame:
    """Day-of-week seasonal indexes per event type: (event_type, dow,
    n_events, mean_value, seasonal_index) where the index is the dow
    mean over the type's overall mean — the classical multiplicative
    seasonal profile (the sanity report behind traffic forecasting and
    anomaly baselines; an index far from 1.0 is the weekly cycle).

    dow derives from integer epoch-day arithmetic ((day + 3) mod 7,
    0 = Monday) — no timezone functions, so every engine reading the
    same file agrees. Means are DECIMAL-exact sums divided in a fixed
    order; the index is one more double division. Two partial-aggregated
    groupBys (type x dow, then type) with the 7-rows-per-type overall
    frame broadcast back."""
    # integer `div` (not `/`): Spark's / on bigints is DOUBLE division,
    # whose round-then-truncate can mis-bucket a boundary microsecond
    base = events.select(
        "event_type",
        ts_micros(events).alias("__us"),
        F.col("value").cast("decimal(28,12)").alias("__v"),
    ).select(
        "event_type",
        ((F.expr(f"CAST(__us div {86400 * US} AS BIGINT)") + 3) % 7).alias("dow"),
        "__v",
    )
    per_dow = base.groupBy("event_type", "dow").agg(
        F.count("*").alias("n_events"), F.sum("__v").alias("__s")
    )
    overall = base.groupBy("event_type").agg(
        F.count("*").alias("__tn"), F.sum("__v").alias("__ts")
    )
    dow_mean = F.col("__s").cast("double") / F.col("n_events")
    type_mean = F.col("__ts").cast("double") / F.col("__tn")
    return (
        per_dow.join(F.broadcast(overall), "event_type")
        .select(
            "event_type",
            "dow",
            "n_events",
            dow_mean.alias("mean_value"),
            (dow_mean / type_mean).alias("seasonal_index"),
        )
        .orderBy("event_type", "dow")
    )


def km_retention(events: DataFrame, censor_window_s: int = 7 * 86400) -> DataFrame:
    """Kaplan-Meier retention curve over user activity lifetimes:
    (day, n_risk, n_events, n_censored, survival) — survival analysis,
    the right way to read "how long do users stay active" when the
    newest users' lifetimes are right-censored by the observation edge
    (a naive mean duration is biased low; KM is not).

    Lifetime = whole days between a user's first and last event;
    a user whose LAST event falls within ``censor_window_s`` of the
    corpus max is censored (still alive at cutoff), contributing to the
    at-risk set but not to the event count. survival(d) =
    prod_{i<=d} (1 - d_i / n_i), the product-limit estimator
    (Kaplan & Meier 1958).

    Shape: ONE user groupBy (corpus-sized, partial-aggregated), then a
    day-grain table bounded by the observation span in DAYS — the
    partition-less cumulative windows and the sequential product fold
    run on that tiny frame, never on event data. The fold order is
    pinned by day, so the doubles match the oracle's windowed
    product()."""
    us = ts_micros(events)
    day_us = 86400 * US
    per_user = (
        events.select("user_id", us.alias("__us"))
        .groupBy("user_id")
        .agg(F.min("__us").alias("__first"), F.max("__us").alias("__last"))
    )
    mx = per_user.agg(F.max("__last").alias("__max_us"))
    tagged = per_user.crossJoin(F.broadcast(mx)).select(
        F.expr(f"CAST((__last - __first) div {day_us} AS BIGINT)").alias("day"),
        (
            F.col("__last") >= F.col("__max_us") - F.lit(censor_window_s * US)
        ).alias("__cens"),
    )
    days = tagged.groupBy("day").agg(
        F.sum(F.when(~F.col("__cens"), 1).otherwise(0)).alias("n_events"),
        F.sum(F.when(F.col("__cens"), 1).otherwise(0)).alias("n_censored"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    total = days.agg(
        F.sum(F.col("n_events") + F.col("n_censored")).alias("__n")
    )
    curve = (
        days.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk",
            F.col("__n")
            - F.coalesce(
                F.sum(F.col("n_events") + F.col("n_censored")).over(w), F.lit(0)
            ),
        )
        .withColumn(
            "__f",
            F.lit(1.0) - F.col("n_events").cast("double") / F.col("n_risk"),
        )
        .withColumn(
            "survival",
            F.aggregate(
                F.collect_list("__f").over(w_cum), F.lit(1.0), lambda a, x: a * x
            ),
        )
    )
    return curve.select(
        "day", "n_risk", "n_events", "n_censored", "survival"
    ).orderBy("day")
