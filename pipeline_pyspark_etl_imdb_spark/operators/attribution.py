"""Position-based (U-shaped) multi-touch attribution: each purchase's
value is credited back across the user's preceding touch events — 40%
to the first touch, 40% to the last, the middle 20% split evenly; one
touch takes all, two split evenly. The standard marketing-attribution
refinement of the last-click asof join (operators/asof.py is the
single-touch special case). Extends the reference's join+window family
(SURVEY.md §2 J1/W1; reference parity src/etl_imdb.py:243-276).

Exactness: weights are small rationals of the touch count k (0.4,
0.2/(k-2), ...), each credit is ONE double multiply, and the final
per-channel sums accumulate in DECIMAL(28,12) — order-independent,
bit-identical cross-engine, hence oracle-backed.

Physical shape (survives 100 TB):
- the touch<->purchase pairing is a USER-KEYED equi-join with a time-
  range predicate — per-user fan-out is bounded by the lookback window,
  never a cross join (same blocking argument as the binned range join);
- first/last/count per purchase ride ONE window partitioned by the
  purchase id (the join output is already purchase-clustered);
- the channel rollup is a partial-aggregated groupBy over a handful of
  touch types. Purchases with no touch in the window surface as the
  'direct' channel via a left_anti — nothing is silently dropped."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.eventtime import US, ts_micros

_DEC = "decimal(28,12)"


def position_based_attribution(
    events: DataFrame,
    purchase_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    lookback_s: int = 7 * 86400,
) -> DataFrame:
    """(channel, attributed_value, n_credits) — purchase value credited
    to touch channels U-shaped, plus the 'direct' row for purchases with
    no preceding touch inside the lookback window."""
    us = ts_micros(events)
    purch = events.where(F.col("event_type") == purchase_type).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_id"),
        us.alias("p_us"),
        F.col("value").alias("p_value"),
    )
    touches = events.where(F.col("event_type").isin(*touch_types)).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("t_id"),
        us.alias("t_us"),
        F.col("event_type").alias("channel"),
    )
    lb = F.lit(int(lookback_s) * US)
    joined = purch.join(touches, "p_user").where(
        (F.col("t_us") < F.col("p_us")) & (F.col("t_us") >= F.col("p_us") - lb)
    )
    w = Window.partitionBy("p_id")
    w_asc = w.orderBy(F.asc("t_us"), F.asc("t_id"))
    w_desc = w.orderBy(F.desc("t_us"), F.desc("t_id"))
    ranked = (
        joined.withColumn("__k", F.count("*").over(w))
        .withColumn("__rf", F.row_number().over(w_asc))
        .withColumn("__rl", F.row_number().over(w_desc))
    )
    k = F.col("__k")
    weight = (
        F.when(k == 1, F.lit(1.0))
        .when(k == 2, F.lit(0.5))
        .when(F.col("__rf") == 1, F.lit(0.4))
        .when(F.col("__rl") == 1, F.lit(0.4))
        .otherwise(F.lit(0.2) / (k - 2))
    )
    credits = ranked.select(
        "channel", (F.col("p_value") * weight).cast(_DEC).alias("__credit")
    )
    direct = (
        purch.join(joined.select("p_id").distinct(), "p_id", "left_anti")
        .select(
            F.lit("direct").alias("channel"),
            F.col("p_value").cast(_DEC).alias("__credit"),
        )
    )
    return (
        credits.unionAll(direct)
        .groupBy("channel")
        .agg(
            F.sum("__credit").cast("double").alias("attributed_value"),
            F.count("*").alias("n_credits"),
        )
        .orderBy("channel")
    )
