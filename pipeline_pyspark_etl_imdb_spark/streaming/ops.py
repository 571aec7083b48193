"""Structured Streaming operators over the events feed.

The reference has no streaming surface at all (SURVEY.md §2.8); this module
adds the standard event-stream toolkit the batch operators in
``operators/eventtime.py`` mirror:

- watermarked tumbling / sliding window KPIs (``F.window`` — incremental
  state store aggregation, late data beyond the watermark dropped);
- gap-based sessionization via the built-in ``F.session_window`` (state
  merges windows whose gap is below the timeout — the streaming analogue of
  the lag+running-sum batch pattern);
- streaming deduplication with ``dropDuplicatesWithinWatermark`` (bounded
  state: the key store evicts once the watermark passes);
- an ``applyInPandasWithState`` custom stateful operator (per-user running
  totals) for semantics the declarative surface can't express.

Scale design: every operator keys its state by (window x event_type) or
user_id — uniformly distributed in the fixtures and shuffled once into the
state store; watermarks bound state size so a 1000-executor continuous job
neither OOMs nor grows checkpoints without bound. Batch parity is tested by
running each stream with ``trigger(availableNow=True)`` over the same files
the batch operators read (tests/test_streaming.py).

Timestamp handling: watermarks need a real TimestampType, so
``with_event_time`` normalizes whatever the fixture stores (TIMESTAMP_NTZ
micros today; bigint TIMESTAMP(NANOS) in older fixtures) through
``eventtime.ts_micros`` -> ``F.timestamp_micros`` — identical to the
batch path.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pipeline_pyspark_etl_imdb_spark.operators.eventtime import ts_micros


def with_event_time(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize the event-time column to TimestampType (microseconds),
    whatever the storage type, as ``event_time``."""
    return events.withColumn("event_time", F.timestamp_micros(ts_micros(events, ts_col)))


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the events fixture directory.

    Streaming reads need an explicit schema (no inference mid-stream), so we
    snapshot it from a batch read of the same path — in production this
    would come from the table catalog.
    """
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the fixture is a single file inside the sf dir; FileStreamSource wants
    # a directory path, so stream the dir filtered down to the events file
    reader = (
        spark.readStream.schema(schema).option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(sf_dir)


def tumbling_kpi_stream(
    events: DataFrame, width_s: int = 600, watermark_s: int = 3600
) -> DataFrame:
    """Streaming tumbling-window KPI: count + value sum per (window,
    event_type). Same math as eventtime.tumbling_kpi; output keys the
    window by its start epoch second."""
    timed = with_event_time(events).withWatermark("event_time", f"{watermark_s} seconds")
    return (
        timed.groupBy(F.window("event_time", f"{width_s} seconds"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp("window.start").alias("window_start_s"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_kpi_stream(
    events: DataFrame, width_s: int = 600, slide_s: int = 300, watermark_s: int = 3600
) -> DataFrame:
    """Streaming sliding-window counts (each event in width/slide windows)."""
    timed = with_event_time(events).withWatermark("event_time", f"{watermark_s} seconds")
    return (
        timed.groupBy(
            F.window("event_time", f"{width_s} seconds", f"{slide_s} seconds"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_timestamp("window.start").alias("window_start_s"),
            "event_type",
            "n_events",
        )
    )


def sessionize_stream(
    events: DataFrame, gap_s: int = 1800, watermark_s: int = 7200
) -> DataFrame:
    """Gap-based sessions per user via the built-in session_window: windows
    closer than ``gap_s`` merge; a session closes once the watermark passes
    its end. Emits one row per closed session."""
    timed = with_event_time(events).withWatermark("event_time", f"{watermark_s} seconds")
    return (
        timed.groupBy(
            F.session_window("event_time", f"{gap_s} seconds"), F.col("user_id")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp("session_window.start").alias("start_s"),
            F.unix_timestamp("session_window.end").alias("end_s"),
            "n_events",
        )
    )


def stream_dedup(events: DataFrame, watermark_s: int = 3600) -> DataFrame:
    """Exactly-once event feed: drop duplicate event_ids arriving within the
    watermark horizon. State stores only ids newer than the watermark, so
    memory is bounded by (event rate x watermark), not stream length."""
    timed = with_event_time(events).withWatermark("event_time", f"{watermark_s} seconds")
    return timed.dropDuplicatesWithinWatermark(["event_id"])


_RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_RUNNING_TOTALS_STATE = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _running_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def user_running_totals_stream(events: DataFrame, watermark_s: int = 3600) -> DataFrame:
    """Custom stateful operator: per-user running event count and value
    total across triggers (applyInPandasWithState — Arrow-batched, state is
    a tiny fixed-width tuple per user)."""
    timed = with_event_time(events).withWatermark("event_time", f"{watermark_s} seconds")
    return (
        timed.select("user_id", "value", "event_time")
        .groupBy("user_id")
        .applyInPandasWithState(
            _running_totals,
            outputStructType=_RUNNING_TOTALS_SCHEMA,
            stateStructType=_RUNNING_TOTALS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_FUNNEL_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("depth", LongType()),
        StructField("last_us", LongType()),
    ]
)

_FUNNEL_STATE = StructType(
    [StructField("depth", LongType()), StructField("last_us", LongType())]
)


def funnel_depth_stream(
    events: DataFrame,
    steps: tuple[str, ...],
    watermark_s: int = 3600,
) -> DataFrame:
    """Streaming ordered funnel: per user, the deepest step reached where
    each step's event is STRICTLY after the event that reached the
    previous step — the continuous counterpart of
    ``operators/journeys.funnel`` (same fold, state carried across
    triggers instead of across an array).

    State per user is two integers (depth, last reach time) — fixed-width
    regardless of stream length; events sort by (event_time, step) WITHIN
    each trigger before folding, so the result is exact whenever
    cross-trigger arrival respects event-time order (the availableNow
    parity case, and any source partitioned by time); intra-trigger
    disorder is always handled. tests/test_streaming.py checks final
    depths against the batch funnel."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    step_at = {i: s for i, s in enumerate(steps)}
    n_steps = len(steps)

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        depth, last_us = state.get if state.exists else (0, -1)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            rows = pd.concat(chunks).sort_values(
                ["event_time", "event_type"], kind="mergesort"
            )
            for ts, step in zip(rows["event_time"], rows["event_type"]):
                us = ts.value // 1_000
                if depth < n_steps and step == step_at[depth] and us > last_us:
                    depth += 1
                    last_us = us
        state.update((depth, last_us))
        yield pd.DataFrame(
            {"user_id": [user_id], "depth": [depth], "last_us": [last_us]}
        )

    timed = with_event_time(events).withWatermark(
        "event_time", f"{watermark_s} seconds"
    )
    return (
        timed.where(F.col("event_type").isin(list(steps)))
        .select("user_id", "event_type", "event_time")
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=_FUNNEL_OUT_SCHEMA,
            stateStructType=_FUNNEL_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_ANOM_OUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("z", DoubleType()),
    ]
)

# ring buffer of the trailing window's values — fixed width per key
_ANOM_STATE = StructType([StructField("window", ArrayType(DoubleType()))])

_ANOM_WINDOW = 20


def anomaly_zscore_stream(
    events: DataFrame,
    threshold: float = 3.0,
    watermark_s: int = 3600,
) -> DataFrame:
    """Streaming rolling-window anomaly detector: per event type, emit
    events whose value deviates more than ``threshold`` sample standard
    deviations from the TRAILING 20 values — the continuous counterpart
    of the batch ``event_value_anomalies`` query.

    State per key is a bounded ring buffer (20 doubles) regardless of
    stream length; events sort by event time within each trigger, so
    parity with the batch ROWS-frame window holds whenever triggers
    respect time order (checked in tests/test_streaming.py)."""

    def detect(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        (window,) = state.get if state.exists else ([],)
        window = list(window)
        out_id: list[int] = []
        out_v: list[float] = []
        out_z: list[float] = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            rows = pd.concat(chunks).sort_values(
                ["event_time", "event_id"], kind="mergesort"
            )
            for eid, v in zip(rows["event_id"], rows["value"]):
                v = float(v) if v == v else 0.0
                n = len(window)
                if n >= 2:
                    mean = sum(window) / n
                    var = sum((x - mean) ** 2 for x in window) / (n - 1)
                    if var > 0:
                        z = (v - mean) / var**0.5
                        if abs(z) > threshold:
                            out_id.append(int(eid))
                            out_v.append(v)
                            out_z.append(z)
                window.append(v)
                if len(window) > _ANOM_WINDOW:
                    window.pop(0)
        state.update((window,))
        yield pd.DataFrame(
            {
                "event_type": [event_type] * len(out_id),
                "event_id": out_id,
                "value": out_v,
                "z": out_z,
            }
        )

    timed = with_event_time(events).withWatermark(
        "event_time", f"{watermark_s} seconds"
    )
    return (
        timed.select("event_type", "event_id", "value", "event_time")
        .groupBy("event_type")
        .applyInPandasWithState(
            detect,
            outputStructType=_ANOM_OUT_SCHEMA,
            stateStructType=_ANOM_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def click_purchase_join_stream(
    events: DataFrame, within_s: int = 600, watermark_s: int = 3600
) -> DataFrame:
    """Stream-stream inner join: each purchase paired with the same user's
    clicks in the preceding ``within_s`` seconds.

    Both sides carry watermarks and the join condition bounds event-time
    distance, so the state store can expire rows once the watermark
    passes — the required shape for an unbounded stream-stream join
    (without the time bound, state grows forever). One shuffle on
    user_id; state per side is (rate x within+watermark) rows.
    """
    timed = with_event_time(events)
    clicks = (
        timed.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("event_time").alias("click_time"),
        )
        .withWatermark("click_time", f"{watermark_s} seconds")
    )
    purchases = (
        timed.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("event_time").alias("purchase_time"),
        )
        .withWatermark("purchase_time", f"{watermark_s} seconds")
    )
    return purchases.join(
        clicks,
        F.expr(
            f"""
            p_user_id = c_user_id AND
            click_time <= purchase_time AND
            click_time >= purchase_time - INTERVAL {within_s} seconds
            """
        ),
        "inner",
    ).select(
        F.col("p_user_id").alias("user_id"),
        "purchase_id",
        "click_id",
        F.unix_timestamp("purchase_time").alias("purchase_s"),
        F.unix_timestamp("click_time").alias("click_s"),
    )


def transform_with_state_available() -> bool:
    """Spark 4's transformWithStateInPandas (the successor stateful API to
    applyInPandasWithState) speaks protobuf between the JVM state server
    and the Python stateful-processor worker; without ``google.protobuf``
    installed the driver worker crashes at init
    (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE). Gate callers on
    this check — this container has no protobuf, so the engine ships the
    operator but tests skip it here (same policy as the PIL/ffmpeg codec
    gates in operators/multimodal.py)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def user_totals_tws_stream(events: DataFrame) -> DataFrame:
    """Per-user running totals via transformWithStateInPandas — the Spark 4
    arbitrary-state API (typed ValueState, optional TTL, timers) that
    supersedes applyInPandasWithState. Semantically identical to
    user_running_totals_stream; requires the RocksDB state store and a
    protobuf-capable Python environment (transform_with_state_available).
    """
    import pandas as _pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _UserTotals(StatefulProcessor):
        def init(self, handle):  # noqa: D102
            self._state = handle.getValueState("totals", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):  # noqa: D102
            n, total = 0, 0.0
            if self._state.exists():
                got = self._state.get()
                n, total = got[0], got[1]
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
            self._state.update((n, total))
            yield _pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self):  # noqa: D102
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        _UserTotals(),
        outputStructType="user_id long, n_events long, total_value double",
        outputMode="Update",
        timeMode="None",
    )


def trending_counts_stream(
    events: DataFrame, width_s: int = 600, watermark_s: int = 3600
) -> DataFrame:
    """Windowed per-type counts feeding a trending-top-k sink. Window
    functions can't run on a streaming aggregate, so the rank-and-cut is
    NOT here: apply ``trending_topk_finalize`` inside foreachBatch (or on
    the completed result) — the standard two-stage trending pattern.
    State is watermark-bounded: one row per (window, event_type)."""
    timed = with_event_time(events).withWatermark(
        "event_time", f"{watermark_s} seconds"
    )
    return (
        timed.groupBy(F.window("event_time", f"{width_s} seconds"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_timestamp("window.start").alias("window_start_s"),
            "event_type",
            "n_events",
        )
    )


def trending_topk_finalize(counts: DataFrame, k: int = 3) -> DataFrame:
    """Per-window top-k cut over (micro-)batch windowed counts.
    Deterministic tie-break by event_type; plans as WindowGroupLimit on
    the batch side."""
    w = Window.partitionBy("window_start_s").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("window_start_s", "rank", "event_type", "n_events")
    )


def stream_to_parquet(
    stream_df: DataFrame,
    dest_path: str,
    checkpoint_dir: str,
    *,
    partition_cols: list[str] | None = None,
    timeout_s: int = 120,
) -> None:
    """Drain the available data into a parquet directory sink (append —
    the only mode file sinks support) with exactly-once file commit via
    the checkpoint's write-ahead commit log. Partitioned layout gives the
    downstream batch readers partition pruning over the streamed output."""
    writer = (
        stream_df.writeStream.format("parquet")
        .option("path", dest_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    query = writer.start()
    try:
        finished = query.awaitTermination(timeout_s)
        if not finished:
            raise TimeoutError(
                f"stream_to_parquet did not drain within {timeout_s}s — the "
                "sink holds only the batches committed so far"
            )
    finally:
        query.stop()


def stream_upsert_parquet(
    stream_df: DataFrame,
    base_path: str,
    keys: list[str],
    order_col: str,
    checkpoint_dir: str,
    *,
    timeout_s: int = 120,
) -> None:
    """Continuously MERGE a stream into a parquet base table — the
    streaming CDC-apply the append-only file sink can't express. Each
    micro-batch: union the batch with the current base and keep the
    max-``order_col`` row per key (version-aware upsert — a micro-batch
    carrying an OLDER version than the base row must lose, because file
    arrival order doesn't guarantee event order), write the result to a
    staging dir, then atomically swap it in with a filesystem rename —
    the read-your-own-input hazard of overwriting a table you are
    scanning never arises. Plain arrival-order MERGE is
    operators/warehouse.merge_upsert; this is its streaming counterpart.

    Exactly-once: keep-max-version is idempotent AND commutative across
    batch splits (re-applying a batch after crash-recovery, or batches
    arriving out of order, converge to the same table), and the
    checkpoint's commit log skips fully-committed batches. At scale the
    base table would be bucketed by the merge key (sources/bucketing.py)
    so the per-batch window shuffles only the small batch side.
    """
    from pyspark.sql.utils import AnalysisException

    from pipeline_pyspark_etl_imdb_spark.operators.dedup import (
        dedup_by_key_deterministic,
    )

    staging_path = base_path.rstrip("/") + "__staging"

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        tiebreak = [F.col(order_col).desc(), *[F.col(k) for k in keys]]
        try:
            base = spark.read.parquet(base_path)
            merged = dedup_by_key_deterministic(
                base.unionByName(batch.select(*base.columns)), keys, tiebreak
            )
        except AnalysisException:  # first batch: no base table yet
            merged = dedup_by_key_deterministic(batch, keys, tiebreak)
        merged.write.mode("overwrite").parquet(staging_path)
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        dst = jvm.org.apache.hadoop.fs.Path(base_path)
        src = jvm.org.apache.hadoop.fs.Path(staging_path)
        fs = dst.getFileSystem(conf)
        if fs.exists(dst):
            fs.delete(dst, True)
        fs.rename(src, dst)

    query = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = query.awaitTermination(timeout_s)
        if not finished:
            raise TimeoutError(
                f"stream_upsert_parquet did not drain within {timeout_s}s"
            )
    finally:
        query.stop()


def run_available_now(
    stream_df: DataFrame,
    checkpoint_dir: str,
    query_name: str = "stream_test",
    output_mode: str = "append",
    timeout_s: int = 120,
) -> DataFrame:
    """Run a streaming DataFrame to completion over the data available now
    and return the collected result as a batch DataFrame (memory sink).
    The batch-parity harness used by tests."""
    query = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = query.awaitTermination(timeout_s)
        if not finished:
            raise TimeoutError(
                f"stream {query_name!r} did not drain within {timeout_s}s — "
                "a partial memory table would silently corrupt parity checks"
            )
    finally:
        query.stop()
    return stream_df.sparkSession.table(query_name)


def value_psi_stream(
    events: DataFrame,
    baseline_shares: list[float],
    lo: float = 0.0,
    hi: float = 1000.0,
    width_s: int = 3600,
    watermark_s: int = 3600,
    eps: float = 1e-6,
) -> DataFrame:
    """Streaming distribution-drift monitor: per tumbling window, the
    Population Stability Index of the `value` distribution against a
    fixed baseline histogram (the batch twin is
    operators/evalmetrics.psi_drift; same eps smoothing, same bands:
    <0.1 stable, >0.25 shifted). Output:
    (window_start_s, n_events, psi).

    Structured Streaming permits ONE aggregation per query, so the
    per-bin histogram AND the PSI must come from a single groupBy: each
    bin's count is a conditional sum column inside one windowed
    aggregate (n_bins counters per window — the same one-pass trick as
    evalmetrics.threshold_metrics), and the PSI folds those columns with
    the broadcast-literal baseline in a map-only projection. State per
    window is n_bins integers, watermark-bounded."""
    n_bins = len(baseline_shares)
    timed = with_event_time(events).withWatermark(
        "event_time", f"{watermark_s} seconds"
    )
    frac = (F.col("value") - lo) / (hi - lo)
    b = F.greatest(
        F.lit(0), F.least(F.floor(frac * n_bins).cast("int"), F.lit(n_bins - 1))
    )
    agg = timed.withColumn("__b", b).groupBy(
        F.window("event_time", f"{width_s} seconds")
    ).agg(
        F.count("*").alias("n_events"),
        *[
            F.sum((F.col("__b") == i).cast("bigint")).alias(f"__c{i}")
            for i in range(n_bins)
        ],
    )
    psi = None
    for i, share in enumerate(baseline_shares):
        p = F.col(f"__c{i}").cast("double") / F.col("n_events") + eps
        q = F.lit(float(share)) + eps
        term = (p - q) * F.log(p / q)
        psi = term if psi is None else psi + term
    return agg.select(
        F.unix_timestamp("window.start").alias("window_start_s"),
        "n_events",
        psi.alias("psi"),
    )


_CUSUM_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("cp_event_id", LongType()),
        StructField("cp_us", LongType()),
        StructField("max_abs_cusum", DoubleType()),
    ]
)
_CUSUM_STATE = StructType(
    [
        StructField("cusum", DoubleType()),
        StructField("peak", DoubleType()),
        StructField("peak_event_id", LongType()),
        StructField("peak_us", LongType()),
    ]
)


def cusum_monitor_stream(
    events: DataFrame,
    target_mean: float,
    watermark_s: int = 3600,
) -> DataFrame:
    """Streaming CUSUM drift monitor: per user, maintain the running sum
    of (value - target_mean) and emit a row whenever the |CUSUM| peak
    improves — the continuous counterpart of the batch
    eventtime.cusum_changepoints (which derives target_mean from the
    corpus; a stream monitors drift against a KNOWN reference level,
    Page 1954's original control-chart setting).

    State per key is four scalars — O(1) regardless of stream length.
    Events sort by event time within each trigger, so the fold order
    (and therefore every float) matches the batch ROWS-frame window
    whenever triggers respect time order; the LAST emission per user is
    the batch answer (parity-gated in tests/test_streaming.py)."""

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            cusum, peak, pid, pus = state.get
        else:
            cusum, peak, pid, pus = 0.0, float("-inf"), -1, -1
        improved = False
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            rows = pd.concat(chunks).sort_values(
                ["us", "event_id"], kind="mergesort"
            )
            for eid, us, v in zip(rows["event_id"], rows["us"], rows["value"]):
                cusum += float(v) - target_mean
                a = abs(cusum)
                if a > peak:
                    peak, pid, pus = a, int(eid), int(us)
                    improved = True
        state.update((cusum, peak, pid, pus))
        if improved:
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "cp_event_id": [pid],
                    "cp_us": [pus],
                    "max_abs_cusum": [peak],
                }
            )
        else:
            yield pd.DataFrame(
                {"user_id": [], "cp_event_id": [], "cp_us": [], "max_abs_cusum": []}
            )

    timed = with_event_time(events).withWatermark(
        "event_time", f"{watermark_s} seconds"
    )
    return (
        timed.select(
            "user_id",
            "event_id",
            "value",
            "event_time",
            F.unix_micros("event_time").alias("us"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=_CUSUM_OUT_SCHEMA,
            stateStructType=_CUSUM_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def enriched_segment_kpi_stream(
    events: DataFrame,
    customers: DataFrame,
    window_s: int = 600,
    watermark_s: int = 3600,
) -> DataFrame:
    """Stream-STATIC enrichment join + windowed KPI — the most common
    production streaming shape (a fact stream decorated with a dimension
    snapshot), distinct from click_purchase_join_stream's stream-stream
    case: the static side carries NO watermark and holds NO join state —
    it is re-planned every micro-batch, so a dim refresh lands on the
    next trigger, and under broadcast it never shuffles the stream.
    Unmatched users keep a NULL segment (left join — enrichment must not
    drop facts).

    Output: per (tumbling window, market segment) event counts and value
    sums, watermark-bounded like every other windowed aggregate here."""
    timed = with_event_time(events).withWatermark(
        "event_time", f"{watermark_s} seconds"
    )
    dim = customers.select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    return (
        timed.join(F.broadcast(dim), "user_id", "left")
        .groupBy(
            F.window("event_time", f"{window_s} seconds").alias("w"),
            "segment",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start_s"),
            "segment",
            "n_events",
            "total_value",
        )
    )


def distinct_users_stream(
    events: DataFrame, window_s: int = 600, watermark_s: int = 3600
) -> DataFrame:
    """Streaming cardinality monitor: approximate distinct users per
    tumbling window — the audience-size / bot-flood alarm. HLL++ state
    is a few KB per open window regardless of user cardinality (an
    exact distinct would hold every key in state), and the estimator is
    deterministic for a given input set, so the availableNow run
    batch-parity-matches the same aggregate computed in batch mode."""
    timed = with_event_time(events).withWatermark(
        "event_time", f"{watermark_s} seconds"
    )
    return (
        timed.groupBy(F.window("event_time", f"{window_s} seconds").alias("w"))
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start_s"),
            "approx_users",
            "n_events",
        )
    )
