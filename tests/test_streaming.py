"""Streaming/batch parity: each Structured Streaming operator, run with
trigger(availableNow=True) over the sf0.001 events fixture, must agree with
the equivalent batch computation on the same files."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators import eventtime
from pipeline_pyspark_etl_imdb_spark.streaming import ops as stream_ops
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare_frames


@pytest.fixture(scope="module")
def events_batch(spark):
    return spark.read.parquet(f"{SF_SMOKE}/events.parquet")


def _run(spark, stream_df, tmp_path, name, output_mode="append"):
    return stream_ops.run_available_now(
        stream_df, str(tmp_path / f"ckpt_{name}"), query_name=name, output_mode=output_mode
    ).toPandas()


def test_tumbling_kpi_stream_matches_batch(spark, events_batch, tmp_path):
    stream = stream_ops.read_events_stream(spark, SF_SMOKE)
    got = _run(
        spark, stream_ops.tumbling_kpi_stream(stream), tmp_path, "tumbling", "complete"
    )
    want = eventtime.tumbling_kpi(events_batch).toPandas()
    assert not compare_frames(got, want)


def test_sliding_kpi_stream_matches_batch(spark, events_batch, tmp_path):
    stream = stream_ops.read_events_stream(spark, SF_SMOKE)
    got = _run(
        spark, stream_ops.sliding_kpi_stream(stream), tmp_path, "sliding", "complete"
    )
    want = eventtime.sliding_kpi(events_batch).toPandas()
    assert not compare_frames(got, want)


def test_trending_topk_stream_matches_batch(spark, events_batch, tmp_path):
    stream = stream_ops.read_events_stream(spark, SF_SMOKE)
    counts = _run(
        spark,
        stream_ops.trending_counts_stream(stream),
        tmp_path,
        "trending",
        "complete",
    )
    got = (
        stream_ops.trending_topk_finalize(
            spark.createDataFrame(counts), k=3
        ).toPandas()
    )
    batch_counts = (
        eventtime.tumbling_kpi(events_batch)
        .select("window_start_s", "event_type", "n_events")
    )
    want = stream_ops.trending_topk_finalize(batch_counts, k=3).toPandas()
    assert not compare_frames(got, want)


def test_sessionize_stream_matches_batch(spark, events_batch, tmp_path):
    stream = stream_ops.read_events_stream(spark, SF_SMOKE)
    got = _run(
        spark, stream_ops.sessionize_stream(stream), tmp_path, "sessions", "complete"
    )
    # batch sessionize emits (user_id, session_idx, n_events, start_s, end_s);
    # session_window's end is last-event + gap, so compare on start_s.
    want = (
        eventtime.sessionize(events_batch)
        .select("user_id", "start_s", "n_events")
        .toPandas()
    )
    got = got[["user_id", "start_s", "n_events"]]
    assert not compare_frames(got, want)


def test_stream_dedup_drops_duplicate_ids(spark, events_batch, tmp_path):
    stream = stream_ops.read_events_stream(spark, SF_SMOKE)
    got = _run(spark, stream_ops.stream_dedup(stream), tmp_path, "dedup")
    n_unique = events_batch.select("event_id").distinct().count()
    assert len(got) == n_unique
    assert got["event_id"].is_unique


def test_stream_stream_join_matches_batch(spark, events_batch, tmp_path):
    """Stream-stream watermarked join == the equivalent batch join over the
    same files."""
    from pipeline_pyspark_etl_imdb_spark.operators.eventtime import ts_micros

    stream = stream_ops.read_events_stream(spark, SF_SMOKE)
    got = _run(
        spark,
        stream_ops.click_purchase_join_stream(stream, within_s=600),
        tmp_path,
        "ssjoin",
    )
    base = events_batch.select(
        "event_id", "user_id", "event_type", ts_micros(events_batch).alias("us")
    )
    clicks = base.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("us").alias("c_us"),
    )
    purchases = base.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("us").alias("p_us")
    )
    want = (
        purchases.join(
            clicks,
            (F.col("user_id") == F.col("c_user_id"))
            & (F.col("c_us") <= F.col("p_us"))
            & (F.col("c_us") >= F.col("p_us") - 600_000_000),
        )
        .select(
            "user_id",
            "purchase_id",
            "click_id",
            (F.col("p_us") / 1_000_000).cast("long").alias("purchase_s"),
            (F.col("c_us") / 1_000_000).cast("long").alias("click_s"),
        )
        .toPandas()
    )
    assert len(got) > 0
    assert not compare_frames(got, want)


def test_stream_to_partitioned_parquet_sink(spark, events_batch, tmp_path):
    """File sink: streamed events land in an event_type-partitioned parquet
    directory whose batch read-back equals the source (append mode,
    exactly-once commit log)."""
    import pathlib

    dest, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt_sink")
    stream = stream_ops.read_events_stream(spark, SF_SMOKE)
    stream_ops.stream_to_parquet(
        stream_ops.stream_dedup(stream),
        dest,
        ckpt,
        partition_cols=["event_type"],
    )
    assert any(
        p.name.startswith("event_type=") for p in pathlib.Path(dest).iterdir()
    )
    got = spark.read.parquet(dest)
    assert got.count() == events_batch.select("event_id").distinct().count()
    src_ids = {r.event_id for r in events_batch.select("event_id").distinct().collect()}
    assert {r.event_id for r in got.select("event_id").collect()} == src_ids


def test_checkpoint_recovery_resumes_not_reprocesses(spark, events_batch, tmp_path):
    """Kill-and-restart semantics: a stream that already consumed its input
    must, when restarted on the same checkpoint with a fresh sink, emit
    nothing new (offsets live in the checkpoint, not the sink) — the
    exactly-once contract a 1000-executor continuous job relies on."""
    ckpt = str(tmp_path / "ckpt_recover")
    stream = stream_ops.read_events_stream(spark, SF_SMOKE)
    agg = stream_ops.tumbling_kpi_stream(stream)

    first = stream_ops.run_available_now(agg, ckpt, "recover_a", "complete").toPandas()
    want = eventtime.tumbling_kpi(events_batch).toPandas()
    assert not compare_frames(first, want)

    # restart from the same checkpoint: no new input -> no new batch; the
    # fresh memory sink stays empty instead of replaying history
    stream2 = stream_ops.read_events_stream(spark, SF_SMOKE)
    second = stream_ops.run_available_now(
        stream_ops.tumbling_kpi_stream(stream2), ckpt, "recover_b", "complete"
    ).toPandas()
    assert len(second) == 0


def test_user_running_totals_final_state_matches_batch(spark, events_batch, tmp_path):
    stream = stream_ops.read_events_stream(spark, SF_SMOKE)
    got = _run(
        spark,
        stream_ops.user_running_totals_stream(stream),
        tmp_path,
        "totals",
        "update",
    )
    # update mode re-emits a user's row each trigger; the last row per user
    # is the final state. availableNow over one directory = one trigger, but
    # stay robust to multi-trigger splits.
    got = got.groupby("user_id", as_index=False).last()
    want = (
        events_batch.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("total_value"),
        )
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        got.sort_values("user_id").reset_index(drop=True)[["user_id", "n_events", "total_value"]],
        want.sort_values("user_id").reset_index(drop=True),
        check_dtype=False,
        rtol=1e-9,
    )


def test_stream_upsert_parquet_matches_batch_latest(spark, events_batch, tmp_path):
    """Streaming CDC-apply: after draining multiple micro-batches through
    stream_upsert_parquet, the base table equals the batch latest-row-per-
    user over the same data (merge is associative across batch splits)."""
    src_dir = tmp_path / "upsert_src"
    base_dir = tmp_path / "upsert_base"
    prepared = events_batch.select(
        "event_id", "user_id", "event_type", "value", eventtime.ts_micros(events_batch).alias("us")
    )
    # two files => two micro-batches with maxFilesPerTrigger=1
    prepared.where("event_id % 2 = 0").coalesce(1).write.parquet(str(src_dir / "a"))
    prepared.where("event_id % 2 = 1").coalesce(1).write.parquet(str(src_dir / "b"))
    stream = (
        spark.readStream.schema(prepared.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src_dir))
    )
    stream_ops.stream_upsert_parquet(
        stream,
        str(base_dir),
        keys=["user_id"],
        order_col="us",
        checkpoint_dir=str(tmp_path / "ckpt_upsert"),
    )
    got = spark.read.parquet(str(base_dir)).toPandas()
    from pipeline_pyspark_etl_imdb_spark.operators.dedup import (
        dedup_by_key_deterministic,
    )

    want = dedup_by_key_deterministic(
        prepared, ["user_id"], [F.col("us").desc(), F.col("user_id")]
    ).toPandas()
    assert not compare_frames(got, want)


def test_funnel_depth_stream_matches_batch(spark, events_batch, tmp_path):
    from pipeline_pyspark_etl_imdb_spark.operators.journeys import funnel

    steps = ("view", "click", "purchase")
    stream = stream_ops.read_events_stream(spark, SF_SMOKE)
    got = _run(
        spark,
        stream_ops.funnel_depth_stream(stream, steps),
        tmp_path,
        "funnel",
        "update",
    )
    got = got.groupby("user_id", as_index=False).last()
    # streaming emits per-user depth; the batch funnel reports per-step
    # user counts — aggregate the depths the same way and compare
    got_counts = {
        k: int((got["depth"] >= k).sum())
        for k in range(1, len(steps) + 1)
        if int((got["depth"] >= k).sum()) > 0
    }
    want_counts = {
        r.step_idx: r.n_users for r in funnel(events_batch, steps).collect()
    }
    assert got_counts == want_counts
    # every user with at least one step event appears exactly once
    assert got["user_id"].is_unique


def test_anomaly_zscore_stream_matches_batch(spark, events_batch, tmp_path):
    from pipeline_pyspark_etl_imdb_spark.plans.registry import _event_value_anomalies
    from tests.conftest import SF_SMOKE as _sf

    stream = stream_ops.read_events_stream(spark, SF_SMOKE)
    got = _run(
        spark,
        stream_ops.anomaly_zscore_stream(stream),
        tmp_path,
        "anomaly",
        "append",
    )
    want = _event_value_anomalies(spark, _sf).toPandas()
    got = got.sort_values("event_id").reset_index(drop=True)
    want = want.sort_values("event_id").reset_index(drop=True)
    assert list(got.event_id) == list(want.event_id)
    assert max(abs(got.z - want.z)) < 1e-9


def test_tumbling_kpi_under_rocksdb_state_store(spark, events_batch, tmp_path):
    # large-state deployments run the RocksDB state store (state spills to
    # local disk instead of living on the JVM heap); results must be
    # identical to the default HDFS-backed provider
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    try:
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        stream = stream_ops.read_events_stream(spark, SF_SMOKE)
        got = _run(
            spark,
            stream_ops.tumbling_kpi_stream(stream),
            tmp_path,
            "rocksdb",
            "complete",
        )
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    want = eventtime.tumbling_kpi(events_batch).toPandas()
    assert not compare_frames(got, want)


def test_trending_finalize_plans_window_group_limit(spark):
    counts = spark.createDataFrame(
        [(0, "a", 5), (0, "b", 3), (600, "a", 2)],
        "window_start_s long, event_type string, n_events long",
    )
    plan = (
        stream_ops.trending_topk_finalize(counts, k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # rank<=k must optimize to the per-group cut, not a full window sort
    assert "WindowGroupLimit" in plan


@pytest.mark.skipif(
    not stream_ops.transform_with_state_available(),
    reason="google.protobuf absent: transformWithState driver worker "
    "cannot start in this container (see transform_with_state_available)",
)
def test_user_totals_tws_matches_batch(spark, events_batch, tmp_path):
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    try:
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        stream = stream_ops.read_events_stream(spark, SF_SMOKE)
        got = _run(
            spark,
            stream_ops.user_totals_tws_stream(stream),
            tmp_path,
            "tws",
            "update",
        )
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    got = got.groupby("user_id", as_index=False).last()
    want = (
        events_batch.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("total_value"),
        )
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        got.sort_values("user_id").reset_index(drop=True).astype({"user_id": "int64"}),
        want.sort_values("user_id").reset_index(drop=True).astype({"user_id": "int64"}),
        check_like=True,
    )


def test_stateful_operator_state_survives_restart(spark, events_batch, tmp_path):
    """Kill-and-restart WITH new data: run the stateful running-totals
    operator over half the events, stop, deliver the other half, restart
    from the same checkpoint — the final per-user state must equal the
    batch aggregate over ALL events. This is the guarantee a 1000-executor
    continuous job leans on: state lives in the checkpoint, not the
    process."""
    import shutil

    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    ckpt = str(tmp_path / "ckpt_state_recovery")

    half_a = events_batch.where(F.col("event_id") % 2 == 0)
    half_b = events_batch.where(F.col("event_id") % 2 == 1)

    def deliver(df, name):
        # land a single flat parquet file in the watched directory (the
        # file source lists the dir non-recursively)
        stage = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        shutil.move(str(part), str(src_dir / f"{name}.parquet"))

    deliver(half_a, "batch_a")

    schema = events_batch.schema

    def run_once():
        # memory sink can't recover a checkpoint; foreachBatch can — and
        # it's the production sink shape for stateful update streams
        chunks = []
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "*.parquet")
            .parquet(str(src_dir))
        )
        out = stream_ops.user_running_totals_stream(stream)
        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(lambda df, _id: chunks.append(df.toPandas()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        import pandas as pd

        return (
            pd.concat(chunks)
            if chunks
            else pd.DataFrame(columns=["user_id", "n_events", "total_value"])
        )

    first = run_once()
    assert len(first) > 0

    # process dies; more data lands; a NEW query restarts from checkpoint
    deliver(half_b, "batch_b")
    second = run_once()
    assert len(second) > 0  # only batch_b users re-emitted, with carried state

    # merge: latest row per user across both runs is the final state
    import pandas as pd

    final = (
        pd.concat([first, second])
        .groupby("user_id", as_index=False)
        .last()
    )
    want = (
        events_batch.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("total_value"),
        )
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        final.sort_values("user_id").reset_index(drop=True)[
            ["user_id", "n_events", "total_value"]
        ],
        want.sort_values("user_id").reset_index(drop=True)[
            ["user_id", "n_events", "total_value"]
        ],
        check_dtype=False,
    )


def test_watermark_drops_late_data_in_append_mode(spark, tmp_path):
    """The late-data contract: once the watermark passes a window's end,
    the window finalizes and emits (append mode); a late event for it in
    a LATER trigger is dropped — the emitted row never updates. Three
    files, one per trigger (maxFilesPerTrigger=1), staggered mtimes."""
    import os
    import time as _time

    src = tmp_path / "late_src"
    src.mkdir()
    schema = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"

    def deliver(rows, name, mtime):
        df = spark.createDataFrame(rows, schema)
        stage = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        dest = src / f"{name}.parquet"
        part.rename(dest)
        os.utime(dest, (mtime, mtime))

    t0 = 1_700_000_000  # window [t0, t0+600)
    base = _time.time() - 100
    import datetime as dt

    def ts(sec):
        return dt.datetime.utcfromtimestamp(sec)

    import pandas as pd

    chunks = []

    def run_once():
        # separate availableNow runs against ONE checkpoint guarantee the
        # ordering (watermark persists in the checkpoint between runs)
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "*.parquet")
            .parquet(str(src))
        )
        out = stream_ops.tumbling_kpi_stream(stream, width_s=600, watermark_s=3600)
        q = (
            out.writeStream.outputMode("append")
            .foreachBatch(lambda df, _id: chunks.append(df.toPandas()))
            .option("checkpointLocation", str(tmp_path / "ckpt_late"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: two on-time events, plus an event 2h later that advances the
    # watermark (1h) past the window's end
    deliver(
        [(1, ts(t0 + 10), 1, "click", 1.0, "{}"), (2, ts(t0 + 20), 1, "click", 1.0, "{}")],
        "a",
        base,
    )
    deliver([(3, ts(t0 + 7200), 2, "view", 1.0, "{}")], "b", base + 5)
    run_once()
    # run 2: a LATE event for the now-finalized window -> must be dropped
    deliver([(4, ts(t0 + 30), 1, "click", 1.0, "{}")], "c", base + 10)
    run_once()

    got = pd.concat([c for c in chunks if len(c)], ignore_index=True)
    window_rows = got[got["window_start_s"] == (t0 // 600) * 600]
    assert len(window_rows) == 1  # finalized exactly once, never re-emitted
    assert int(window_rows.iloc[0]["n_events"]) == 2  # late event dropped


def test_value_psi_stream_matches_batch_formula(spark, events_batch, tmp_path):
    """Streaming PSI per window must equal the same single-agg formula
    computed in batch over the same files (and a window whose value
    distribution matches the baseline must sit near zero)."""
    baseline = [0.25, 0.25, 0.25, 0.25]
    stream = stream_ops.read_events_stream(spark, SF_SMOKE)
    got = _run(
        spark,
        stream_ops.value_psi_stream(stream, baseline, lo=0.0, hi=1000.0),
        tmp_path,
        "psi",
        "complete",
    )
    # batch twin: identical expressions over the batch frame
    want = (
        stream_ops.value_psi_stream(
            stream_ops.with_event_time(events_batch), baseline, lo=0.0, hi=1000.0
        )
        .toPandas()
    )
    assert not compare_frames(got, want)
    assert (got.n_events > 0).all()
    assert got.psi.notna().all()


def test_cusum_stream_matches_batch(spark, events_batch, tmp_path):
    # the stream monitors against a KNOWN reference level; feed it the
    # batch corpus mean so the final per-user peak must equal the batch
    # change-point exactly
    mean = (
        events_batch.agg(
            (
                F.sum(F.col("value").cast("decimal(28,12)")).cast("double")
                / F.count("*")
            ).alias("m")
        ).collect()[0].m
    )
    stream = stream_ops.read_events_stream(spark, SF_SMOKE)
    got = _run(
        spark,
        stream_ops.cusum_monitor_stream(stream, target_mean=mean),
        tmp_path,
        "cusum",
        "append",
    )
    # last emission per user is the final peak
    got = got.sort_values(["user_id", "max_abs_cusum"]).groupby("user_id").last()
    want = eventtime.cusum_changepoints(events_batch).toPandas().set_index("user_id")
    assert set(got.index) == set(want.index)
    for u in want.index:
        assert got.loc[u, "cp_event_id"] == want.loc[u, "cp_event_id"], u
        assert abs(got.loc[u, "max_abs_cusum"] - want.loc[u, "max_abs_cusum"]) < 1e-9


def test_enriched_segment_kpi_stream_matches_batch(spark, events_batch, tmp_path):
    customers = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    stream = stream_ops.read_events_stream(spark, SF_SMOKE)
    got = _run(
        spark,
        stream_ops.enriched_segment_kpi_stream(stream, customers),
        tmp_path,
        "enriched",
        "complete",
    )
    # batch twin: identical enrichment + window over the same fixture
    from pyspark.sql import functions as F

    timed = stream_ops.with_event_time(events_batch)
    dim = customers.select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    want = (
        timed.join(F.broadcast(dim), "user_id", "left")
        .groupBy(F.window("event_time", "600 seconds").alias("w"), "segment")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.unix_timestamp("w.start").alias("window_start_s"),
            "segment",
            "n_events",
            "total_value",
        )
        .toPandas()
    )
    assert not compare_frames(got, want)
    # enrichment must not drop facts: totals equal the raw event count
    assert got["n_events"].sum() == events_batch.count()


def test_distinct_users_stream_matches_batch(spark, events_batch, tmp_path):
    from pyspark.sql import functions as F

    stream = stream_ops.read_events_stream(spark, SF_SMOKE)
    got = _run(
        spark,
        stream_ops.distinct_users_stream(stream),
        tmp_path,
        "distincts",
        "complete",
    )
    timed = stream_ops.with_event_time(events_batch)
    want = (
        timed.groupBy(F.window("event_time", "600 seconds").alias("w"))
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start_s"),
            "approx_users",
            "n_events",
        )
        .toPandas()
    )
    assert not compare_frames(got, want)
