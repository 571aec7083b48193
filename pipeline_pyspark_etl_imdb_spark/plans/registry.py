"""Declared query surface: name -> (spark, sf_dir) -> DataFrame.

This is the single source of truth consumed by __spark_entry__.queries(),
bench.py and the oracle test-suite. Every entry has a matching ANSI-SQL
oracle in plans/oracles.py unless listed in ROWS_ONLY (genuinely
non-SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators import (
    abtest,
    attribution,
    basket,
    bpe,
    components,
    corpus,
    diversity,
    evalmetrics,
    eventtime,
    importance,
    inference,
    journeys,
    kcore,
    multimodal,
    neardup,
    prototypes,
    retrieval,
    selection,
    semdedup,
    quantize,
    similarity,
    skew,
    triangles,
    unigram_lm,
    warehouse,
    weaklabel,
)
from pipeline_pyspark_etl_imdb_spark.operators import text as text_ops
from pipeline_pyspark_etl_imdb_spark.operators import udtf as udtf_ops
from pipeline_pyspark_etl_imdb_spark.operators.rangejoin import range_join
from pipeline_pyspark_etl_imdb_spark.plans import analytics

QueryFn = Callable[[SparkSession, str], DataFrame]

KNN_QUERY_IDS = list(range(10))

# stratified-sample targets; tests/test_sampling.py asserts against these
DOC_SAMPLE_FRACTIONS = {"en": 0.5, "es": 0.2, "fr": 0.2, "de": 0.2, "zh": 0.2}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # older event fixtures stored TIMESTAMP(NANOS), readable on a bare
    # session (the driver's) only with this runtime-settable legacy conf;
    # the current fixture is timestamp[us] (TIMESTAMP_NTZ) where the conf
    # is a no-op — kept so the queries stay self-sufficient on either
    # fixture vintage (eventtime.ts_micros normalizes both storage types)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _skew_flag_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation on a 3-value (maximally hot) key."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    return skew.salted_agg(
        li,
        ["l_returnflag"],
        {
            "n_items": (F.count("*"), F.sum("n_items")),
            "sum_qty": (F.sum(qty), F.sum("sum_qty").cast("double")),
        },
        salt_from=["l_orderkey", "l_linenumber"],
    ).orderBy("l_returnflag")


def _skew_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join (big lineitem x replicated orders) then aggregate."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount").cast("decimal(18,4)")
    )
    joined = skew.salted_join(
        li, orders, "l_orderkey", salt_from=["l_orderkey", "l_linenumber"]
    )
    return (
        joined.groupBy("o_orderstatus")
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count("*").alias("n_items"))
        .orderBy("o_orderstatus")
    )


def _purchases_near_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: purchases within 10 minutes after each error event."""
    events = _events(spark, sf_dir)
    base = events.select(
        "event_id", "event_type", eventtime.ts_micros(events).alias("us")
    )
    purchases = base.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "us"
    )
    errors = base.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("us").alias("start_us"),
        (F.col("us") + 600_000_000).alias("end_us"),
    )
    matched = range_join(
        purchases, errors, "us", "start_us", "end_us", bin_width=600_000_000
    )
    return (
        matched.groupBy("error_id")
        .agg(F.count("*").alias("n_purchases"))
        .orderBy("error_id")
    )


_SQL_SEGMENT_LEADERS = """
    WITH seg_year AS (
        SELECT c.c_mktsegment AS segment,
               CAST(year(o.o_orderdate) AS INT) AS order_year,
               sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    )
    SELECT segment, order_year, CAST(rev AS DOUBLE) AS revenue
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY order_year ORDER BY rev DESC, segment ASC
        ) AS rk
        FROM seg_year
    )
    WHERE rk = 1
    ORDER BY order_year
"""


def _sql_segment_leaders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry point: same engine, declared via spark.sql over
    registered views (ANSI text portable to the oracle verbatim)."""
    from pipeline_pyspark_etl_imdb_spark.sources.tables import load_tables

    load_tables(spark, sf_dir, ("orders", "customer"))
    return spark.sql(_SQL_SEGMENT_LEADERS)


def _approx_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — the at-scale cardinality/quantile path
    (HLL++ / KLL-style sketches). Implementation-specific estimates can't
    hash-match another engine, so the driver applies the rows-only check;
    tests/test_approx.py bounds the error against exact values instead."""
    events = _events(spark, sf_dir)
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.percentile_approx("value", 0.5, 10000).alias("approx_median_value"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type")
    )


def _event_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: sample stddev, Pearson correlation and OLS
    slope of value against event time, per event type. Float accumulation
    differences vs the oracle sit ~1e-12 relative — far inside the 1e-6
    comparison rounding."""
    events = _events(spark, sf_dir)
    us = eventtime.ts_micros(events).cast("double")
    return (
        events.select("event_type", F.col("value"), us.alias("t"))
        .groupBy("event_type")
        .agg(
            F.stddev_samp("value").alias("value_stddev"),
            F.corr("value", "t").alias("value_time_corr"),
            F.regr_slope("value", "t").alias("value_time_slope"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type")
    )


_EMA_ALPHA = 0.1


def _ema_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponential moving average of event value over time order —
    a sequential recurrence no SQL window frame expresses. Runs as the
    sort-based grouped scan (eventtime.grouped_ema): one shuffle on
    user_id, one Python call per Arrow batch instead of per group. The
    oracle replays the same recurrence with DuckDB's list_reduce —
    identical IEEE ops in identical order, so the result is bit-equal, not
    just approximately equal."""
    events = _events(spark, sf_dir)
    base = events.select(
        "user_id",
        F.col("value"),
        eventtime.ts_micros(events).alias("us"),
        "event_id",
    )
    return eventtime.grouped_ema(base, alpha=_EMA_ALPHA)


def _events_props_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured path: parse the JSON props column into a typed
    struct with from_json, then aggregate on the extracted fields (vs
    events_json_kpi's per-path get_json_object)."""
    events = _events(spark, sf_dir)
    parsed = events.select(
        "event_type",
        F.from_json(F.col("props"), "k INT, tag STRING").alias("p"),
    )
    return (
        parsed.groupBy("event_type", F.col("p.tag").alias("tag"))
        .agg(
            F.count("*").alias("n"),
            F.sum("p.k").alias("sum_k"),
        )
        .orderBy("event_type", "tag")
    )


def _order_calendar_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar function family: truncate to month, day-of-week/quarter
    extraction, date arithmetic."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        orders.select(
            # string-typed month: date/timestamp-typed outputs don't
            # round-trip identically through pandas across engines
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            F.dayofweek("o_orderdate").alias("dow"),
            F.quarter("o_orderdate").alias("qtr"),
            F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate")).alias(
                "age_days"
            ),
        )
        .groupBy("order_month")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("dow").alias("min_dow"),
            F.max("qtr").alias("qtr"),
            F.min("age_days").alias("min_age_days"),
        )
        .orderBy("order_month")
    )


def _trailing_week_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per order, the customer's total spend in the
    trailing 7 days INCLUDING simultaneous orders — a value-range frame,
    not a row-count frame (two orders on one day both see each other)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    day = (F.unix_timestamp(F.col("o_orderdate")) / 86400).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-6, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_7d_spend"),
    )


def _part_name_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family: regexp extraction, LIKE, case mapping,
    padding, concat_ws, substring."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_name", "^(\\w+)", 1).alias("first_word"),
        F.col("p_name").like("%green%").alias("is_green"),
        F.upper(F.substring("p_brand", 1, 5)).alias("brand_prefix"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_padded"),
        F.concat_ws("|", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        F.length("p_name").cast("bigint").alias("name_len"),
    )


def _event_counts_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long): melt the per-user event-type count columns
    back into (user_id, event_type, n) rows, dropping zero rows — the
    inverse of events_user_pivot."""
    wide = eventtime.user_type_pivot(_events(spark, sf_dir))
    long = wide.unpivot(
        ["user_id"],
        [c for c in wide.columns if c != "user_id"],
        "event_type",
        "n",
    )
    return (
        long.where(F.col("n") > 0)
        .select("user_id", F.expr("substring(event_type, 3)").alias("event_type"), "n")
        .orderBy("user_id", "event_type")
    )


def _stratified_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded stratified sampling per language — the corpus-balancing
    primitive of a training-data pipeline. Sampling is engine-specific
    (seeded Bernoulli over Spark's partition RNG), so the driver applies
    the rows-only check; tests/test_sampling.py asserts per-stratum
    fractions and same-seed determinism."""
    docs = _docs(spark, sf_dir)
    return docs.sampleBy("lang", fractions=DOC_SAMPLE_FRACTIONS, seed=42).select(
        "doc_id", "lang"
    )


# hash-based keep probabilities per language for domain_mix (engine-
# portable, unlike seeded sampleBy — see operators/corpus.py)
DOMAIN_QUOTAS = {"en": 0.6, "es": 0.4, "fr": 0.4, "de": 0.3, "zh": 0.3}

FUNNEL_STEPS = ("view", "click", "purchase")

DAY_US = 86_400_000_000


def _events_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, event_id, day, value, user_id) with exact integer
    day bucketing — shared base for the incremental/sketch rollups."""
    events = _events(spark, sf_dir)
    return events.select(
        "event_type",
        "event_id",
        "user_id",
        "value",
        eventtime.ts_micros(events).alias("us"),
    ).select(
        "event_type",
        "event_id",
        "user_id",
        "value",
        F.expr(f"us div {DAY_US}").alias("day"),
    )


def _incremental_daily_kpi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view refresh: yesterday's aggregate partials (80% of
    events by id hash) merged with today's delta batch (the rest) must
    equal the full recompute — which is exactly what the oracle runs."""
    base = _events_by_day(spark, sf_dir)

    def part(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type", "day").agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_value_dec"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )

    prev = part(base.where(F.col("event_id") % 10 < 8))
    delta = part(base.where(F.col("event_id") % 10 >= 8))
    merged = warehouse.merge_partial_aggregates(
        [prev, delta],
        ["event_type", "day"],
        {
            "n_events": F.sum("n_events"),
            "sum_value": F.sum("sum_value_dec").cast("double"),
            "min_value": F.min("min_value"),
            "max_value": F.max("max_value"),
        },
    )
    return merged.orderBy("event_type", "day")


def _distinct_users_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type distinct users from per-day HLL sketches merged per type
    — the reaggregatable-sketch pattern. Estimates are engine-specific:
    rows-only for the driver; tests/test_warehouse.py bounds the merged
    estimate's error against the exact distinct."""
    return warehouse.sketch_distinct_rollup(
        _events_by_day(spark, sf_dir), ["event_type"], "day", "user_id"
    )


def _event_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window anomaly detection: per event type, z-score of each
    value against the TRAILING 20 events (exclusive of self — a
    ROWS-frame window), flagging |z| > 3. One keyed window shuffle; the
    rolling frame is O(20) state per row regardless of scale."""
    events = _events(spark, sf_dir)
    base = events.select(
        "event_type", "event_id", eventtime.ts_micros(events).alias("us"), "value"
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("us", "event_id")
        .rowsBetween(-20, -1)
    )
    scored = base.select(
        "event_type",
        "event_id",
        "value",
        F.avg("value").over(w).alias("trail_mean"),
        F.stddev_samp("value").over(w).alias("trail_std"),
    ).withColumn(
        "z", (F.col("value") - F.col("trail_mean")) / F.col("trail_std")
    )
    return scored.where(F.abs(F.col("z")) > 3).select(
        "event_type", "event_id", "value", "z"
    )


def _events_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): props parsed ONCE into a
    variant column (binary-encoded, no per-access re-parse), typed
    ``try_variant_get`` extraction, then a per-type aggregate. At scale
    this is the idiom for ragged JSON: one parse per row, shredded
    access, NULL-safe typed gets."""
    events = _events(spark, sf_dir)
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").cast("int").alias("min_k"),
            F.max("k").cast("int").alias("max_k"),
        )
        .orderBy("event_type")
    )


def _cms_user_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimates for every user (d=4, w=64 —
    deliberately small so collisions occur and the estimate is a real
    upper bound, not a disguised exact count). The sketch is the
    bounded-memory summary; hash arithmetic is md5-derived so the oracle
    reproduces it bit-for-bit."""
    events = _events(spark, sf_dir)
    sketch = warehouse.cms_sketch(events, "user_id", d=4, w=64)
    est = warehouse.cms_estimate(
        sketch, events.select("user_id"), "user_id", d=4, w=64
    )
    return est.select(
        F.col("user_id").cast("bigint").alias("user_id"), "est"
    ).orderBy("user_id")


def _embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means cluster assignments over the embedding corpus
    (SemDeDup-style semantic grouping). Float-mean summation order is
    engine-specific, but the measured argmin margins (>= 8.5e-7 rel at
    every SF) clear that spread by 5+ orders, so the integer output is
    engine-stable and hash-oracle-backed (oracles._kmeans_assign_cte);
    values are additionally gated against an independent NumPy Lloyd's
    run in tests/test_kmeans.py."""
    from pipeline_pyspark_etl_imdb_spark.operators.kmeans import lloyd_kmeans

    assigned, _ = lloyd_kmeans(_emb(spark, sf_dir), k=16, n_iter=4)
    return assigned.select("vec_id", "cluster").orderBy("vec_id")


def _nation_customer_roster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set aggregate: Spark 4 ``listagg ... WITHIN GROUP`` builds
    a deterministic comma roster per nation (the ordered string_agg every
    report/export pipeline needs). One partial-aggregated groupBy; the
    roster is bounded by group size, which is the operator's contract
    (use collect_list+slice for unbounded groups)."""
    from pipeline_pyspark_etl_imdb_spark.sources.tables import load_tables

    load_tables(spark, sf_dir, ("customer", "nation"))
    return spark.sql(
        """
        SELECT n_name, count(*) AS n_customers,
               listagg(CAST(c_custkey AS STRING), ',')
                 WITHIN GROUP (ORDER BY c_custkey) AS custkey_roster
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


def _custkey_tree_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): walk each custkey's
    halving chain (parent = k DIV 2) to the root — the declarative
    transitive-closure/hierarchy shape (BOM explosion, org charts) that
    complements the DataFrame loops in operators/components.py. The
    recursion depth is log2(max key); each UNION ALL step is one
    bounded self-extension, not a growing join cascade."""
    from pipeline_pyspark_etl_imdb_spark.sources.tables import load_tables

    load_tables(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        WITH RECURSIVE walk(start, cur, d) AS (
          SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey <= 128
          UNION ALL
          SELECT start, cur DIV 2, d + 1 FROM walk WHERE cur > 1
        )
        SELECT start AS custkey, max(d) AS depth,
               CAST(sum(cur) AS BIGINT) AS path_sum
        FROM walk GROUP BY start
        """
    )


def _supplier_top_orders_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT: top-2
    lineitems per supplier, the SQL spelling of a grouped top-k.
    Catalyst decorrelates the lateral into a join + per-key limit — same
    physical family as the WindowGroupLimit rank-filter path
    (operators/topk.py), declared in ANSI text."""
    from pipeline_pyspark_etl_imdb_spark.sources.tables import load_tables

    load_tables(spark, sf_dir, ("supplier", "lineitem"))
    return spark.sql(
        """
        SELECT s_suppkey, t.l_orderkey, t.l_linenumber, t.l_extendedprice
        FROM (SELECT s_suppkey FROM supplier WHERE s_suppkey <= 20) s,
        LATERAL (
          SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
          WHERE l_suppkey = s.s_suppkey
          ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 2) t
        """
    )


def _pipe_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 `|>` operators — the linear FROM-first
    form): filter -> aggregate -> order as a pipeline. Same Catalyst plan
    as the nested SELECT; covers the modern SQL entry point alongside
    spark.sql classic (sql_segment_leaders)."""
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView(
        "__pipe_orders"
    )
    return spark.sql(
        """
        FROM __pipe_orders
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE count(*) AS n_orders,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS total_revenue
           GROUP BY o_orderpriority
        |> ORDER BY o_orderpriority
        """
    )


def _customer_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: diff the customer table against its
    CDC-merged successor (the deterministic change set from
    merge_upsert_customers) — every key classified ADDED / REMOVED /
    CHANGED / UNCHANGED in one full-outer join."""
    base = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    merged = _merge_upsert_customers(spark, sf_dir)
    return warehouse.snapshot_diff(base, merged, keys=["c_custkey"]).orderBy(
        "c_custkey"
    )


def _null_safe_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): value
    buckets are NULL below 100, and purchase/click events join per user
    on bucket <=> bucket — the NULL<=>NULL matches a plain = would
    silently drop. Counts pairs per bucket including the NULL bucket."""
    events = _events(spark, sf_dir)
    base = events.select(
        "user_id",
        "event_type",
        F.when(
            F.col("value") >= 100, F.floor(F.col("value") / 100).cast("bigint")
        ).alias("bucket"),
    )
    p = base.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("bucket").alias("p_bucket")
    )
    c = base.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("bucket").alias("c_bucket")
    )
    joined = p.join(
        c,
        (p["user_id"] == c["c_user"]) & p["p_bucket"].eqNullSafe(c["c_bucket"]),
    )
    return (
        joined.groupBy("p_bucket")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy(F.col("p_bucket").asc_nulls_first())
    )


def _part_string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function battery over part names: translate, lpad, reverse,
    ascii, repeat, substring, split+element_at (NULL on short names, 3VL
    preserved), instr, length — one map-only projection pinning each
    function's exact semantics against the oracle engine's equivalent."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    name = F.col("p_name")
    return part.select(
        "p_partkey",
        F.translate(name, "aeiou", "AEIOU").alias("vowels_up"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
        F.reverse(name).alias("name_rev"),
        F.ascii(name).alias("first_ascii"),
        F.expr("repeat('*', length(p_name) % 5)").alias("stars"),
        F.substring(name, 1, 4).alias("prefix4"),
        F.element_at(F.split(name, " "), 2).alias("second_word"),
        F.instr(name, "re").cast("int").alias("re_pos"),
        F.length(name).cast("int").alias("name_len"),
    ).orderBy("p_partkey")


def _user_type_share_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed higher-order functions (the MapType face of the HOF
    surface; embedding_vector_stats covers arrays): per-user
    event_type->count map via map_from_entries, transform_values to
    shares of the user's total, map_filter to keep dominant types
    (share >= 0.2), exploded back to scalar rows for hashing. All
    map ops are builtin expressions inside one aggregation plan."""
    events = _events(spark, sf_dir)
    # a NULL event type cannot be a map key (Spark raises NULL_MAP_KEY);
    # untyped events carry no share — no-op on the stock fixtures
    counts = (
        events.where(F.col("event_type").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
    )
    per_user = counts.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "n"))).alias("m"),
        F.sum("n").alias("total"),
    )
    shares = per_user.select(
        "user_id",
        F.map_filter(
            F.transform_values(
                "m", lambda k, v: v.cast("double") / F.col("total")
            ),
            lambda k, v: v >= 0.2,
        ).alias("ms"),
    )
    return shares.select(
        "user_id", F.explode("ms").alias("event_type", "share")
    ).orderBy("user_id", "event_type")


def _orders_pit_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against the SCD2 priority dimension: every
    order decorated with the priority version that HELD on its order
    date (as-was reporting). Dates stringified for cross-engine
    canonicalization, as in the scd2 query."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    log = orders.select("o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")
    vers = warehouse.scd2(
        log,
        key="o_custkey",
        attrs=["o_orderpriority"],
        order_col="o_orderdate",
        tiebreak_col="o_orderkey",
    )
    facts = orders.select("o_custkey", "o_orderkey", "o_orderdate")
    out = warehouse.pit_dimension_join(
        facts,
        vers.withColumnRenamed("o_orderpriority", "priority_asof"),
        key="o_custkey",
        time_col="o_orderdate",
        attrs=["priority_asof"],
    )
    return out.select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        "priority_asof",
        F.date_format("version_from", "yyyy-MM-dd").alias("version_from"),
    ).orderBy("o_orderkey")


def _signed_daily_kpi_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retraction-aware daily-KPI refresh: orders 0 mod 19 get a +5 price
    UPDATE (retract + reinsert), orders 0 mod 23 (and not updated) are
    DELETED; the signed batch folds into the materialized daily view and
    must equal a recompute over the mutated table."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", F.col("o_orderdate").alias("day"), "o_totalprice"
    )
    view = orders.groupBy("day").agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("total"),
    )
    upd = F.col("o_orderkey") % 19 == 0
    dele = (F.col("o_orderkey") % 23 == 0) & ~upd
    delta = (
        orders.where(upd)
        .withColumn("sign", F.lit(-1))
        .unionByName(
            orders.where(upd)
            .withColumn("o_totalprice", F.col("o_totalprice") + 5.0)
            .withColumn("sign", F.lit(1))
        )
        .unionByName(orders.where(dele).withColumn("sign", F.lit(-1)))
        .select("day", "o_totalprice", "sign")
    )
    return warehouse.signed_agg_refresh(
        view, delta, ["day"], "o_totalprice"
    ).orderBy("day")


def _signed_join_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-set refresh end to end: orders 0 mod 13 get a price UPDATE
    (retract old row, insert +10), customers 0 mod 17 are DELETED; the
    output is the refreshed view (old join + signed delta folded in),
    which must equal a full recompute over the new table states."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    touched = F.col("o_orderkey") % 13 == 0
    a_delta = (
        orders.where(touched)
        .withColumn("sign", F.lit(-1))
        .unionByName(
            orders.where(touched)
            .withColumn("o_totalprice", F.col("o_totalprice") + 10.0)
            .withColumn("sign", F.lit(1))
        )
    )
    b_delta = cust.where(F.col("custkey") % 17 == 0).withColumn("sign", F.lit(-1))
    view_old = orders.join(cust, "custkey")
    delta = warehouse.signed_join_delta(orders, a_delta, cust, b_delta, "custkey")
    return warehouse.apply_signed(view_old, delta).orderBy(
        "o_orderkey", "custkey"
    )


def _incremental_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders joined to customers, refreshed incrementally: rows whose
    order key is 0 mod 7 arrive as the orders batch, customers 0 mod 11
    as the dim batch. Output = ONLY the new join rows."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    return warehouse.incremental_join_delta(
        orders.where(F.col("o_orderkey") % 7 != 0),
        orders.where(F.col("o_orderkey") % 7 == 0),
        cust.where(F.col("custkey") % 11 != 0),
        cust.where(F.col("custkey") % 11 == 0),
        "custkey",
    ).orderBy("o_orderkey", "custkey")



def _incremental_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion: odd doc_ids arrive as the new batch, even
    doc_ids are the existing corpus; keep batch docs that are neither
    exact nor near (Jaccard>=0.8) duplicates of the corpus (or of an
    earlier batch doc). See operators/neardup.py::incremental_ingest_dedup."""
    docs = _docs(spark, sf_dir)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    existing = docs.where(F.col("doc_id") % 2 == 0)
    # candidate_source="exact" pinned: this is the oracle-replicable path
    # (the SQL mirrors the full cross-set shingle join). The operator's
    # DEFAULT is "lsh" — the 100 TB path — superset-gated against this
    # exact path in tests/test_ingest_dedup.py.
    return (
        neardup.incremental_ingest_dedup(batch, existing, candidate_source="exact")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


def _daily_orders_vs_events_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two daily aggregates (orders vs events by epoch
    day) — the join type the rest of the surface doesn't exercise. Either
    side may be missing (NULL counts preserved, no coalesce) so the
    oracle checks 3VL on both null sides. Days as integer epoch days —
    engine-portable, no date-type round-trip."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    events = _events(spark, sf_dir)
    o_daily = (
        orders.select(
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).cast("bigint").alias("day_idx")
        )
        .groupBy("day_idx")
        .agg(F.count("*").alias("n_orders"))
    )
    e_daily = (
        events.select(eventtime.ts_micros(events).alias("us"))
        .select(F.expr("us div 86400000000").alias("day_idx"))
        .groupBy("day_idx")
        .agg(F.count("*").alias("n_events"))
    )
    return (
        o_daily.join(e_daily, "day_idx", "full_outer")
        .select("day_idx", "n_orders", "n_events")
        .orderBy("day_idx")
    )


def _event_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-ordered positional aggregates: hourly open/high/low/close
    bars per event type via min_by/max_by on the total (time, id) order —
    first/last WITHOUT a window function, so the whole bar is one
    partially-aggregated groupBy (each partition contributes one
    candidate per bar; no per-row window state)."""
    events = _events(spark, sf_dir)
    base = events.select(
        "event_type",
        "event_id",
        "value",
        eventtime.ts_micros(events).alias("us"),
    ).select(
        "event_type", "event_id", "value", "us",
        F.expr("us div 3600000000").alias("hour"),
    )
    # total order as ONE exact integer ((us, event_id) packed into a
    # decimal — portable to engines whose arg_min/arg_max can't take a
    # struct key); event_id < 10^7 at every fixture scale
    order = F.col("us").cast("decimal(38,0)") * 10_000_000 + F.col("event_id")
    return (
        base.groupBy("event_type", "hour")
        .agg(
            F.min_by("value", order).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", order).alias("close"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("volume"),
        )
        .orderBy("event_type", "hour")
    )


def _brand_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching: distinct brand pairs within edit distance 2,
    blocked on string length so the self-join is per-block, never a full
    cross product (the standard entity-resolution blocking shape —
    swap the block key for soundex/prefix on natural-language names)."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    brands = part.select("p_brand").distinct().withColumn(
        "blk", F.length("p_brand")
    )
    a = brands.select(F.col("p_brand").alias("brand_a"), "blk")
    b = brands.select(F.col("p_brand").alias("brand_b"), "blk")
    return (
        a.join(b, "blk")
        .where(F.col("brand_a") < F.col("brand_b"))
        .withColumn("dist", F.levenshtein("brand_a", "brand_b"))
        .where(F.col("dist") <= 2)
        .select("brand_a", "brand_b", "dist")
    )


def _brand_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end to end: length-blocked edit-distance pairs
    (brand_fuzzy_pairs' edge set) -> min-label connected components ->
    canonical entity id (the lexicographic min member) + member count
    per surface form. The composition every master-data/record-linkage
    pipeline runs; blocking keeps the pair stage per-block, components
    is the O(diameter) loop, and the canonical pick is one aggregate —
    no stage is quadratic in the full entity universe."""
    from pipeline_pyspark_etl_imdb_spark.operators import components

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    brands = part.select("p_brand").distinct()
    edges = _brand_fuzzy_pairs(spark, sf_dir).select("brand_a", "brand_b")
    comp = components.connected_components(edges, "brand_a", "brand_b")
    tagged = (
        brands.join(comp, brands.p_brand == comp.node, "left")
        .select(
            "p_brand",
            F.coalesce("component", F.col("p_brand")).alias("entity"),
        )
    )
    counts = tagged.groupBy("entity").agg(F.count("*").alias("n_members"))
    return tagged.join(counts, "entity").select("p_brand", "entity", "n_members")


def _doc_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned corpus filter, end to end: DISTILL the heuristic quality
    score (operators/text.quality_expr) into a logistic-regression
    classifier — train on a FIXED-SIZE seed (first 500 doc ids, constant
    training cost at any corpus scale), score the whole corpus. This is
    the train-small / score-everything asymmetry of model-based
    filtering, and heuristic→model distillation is how production
    pipelines bootstrap quality classifiers before curated labels exist.
    Iterative float optimization is engine-specific: rows-only."""
    from pipeline_pyspark_etl_imdb_spark.operators.classifier import (
        score_documents,
        train_doc_classifier,
    )
    from pipeline_pyspark_etl_imdb_spark.operators.text import quality_expr

    docs = _docs(spark, sf_dir)
    seed = docs.where(F.col("doc_id") < 500)
    if seed.isEmpty():
        # no training seed -> no model -> no scores (all-NULL frame over
        # the corpus, zero rows when the corpus itself is empty); MLlib's
        # LBFGS summarizer raises on a zero-row fit
        return docs.select(
            "doc_id",
            F.lit(None).cast("double").alias("p_positive"),
            F.lit(None).cast("int").alias("predicted"),
        )
    model = train_doc_classifier(
        seed, quality_expr(F.col("text")) >= 0.5, max_iter=10
    )
    return score_documents(model, docs)


def _part_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over two part dimensions — the
    multi-column data-layout sort key (sources/layout.py); the layout
    effect itself (narrow per-file ranges on both columns) is quantified
    in tests/test_layout.py."""
    from pipeline_pyspark_etl_imdb_spark.sources.layout import zorder_value

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    return part.select(
        "p_partkey",
        zorder_value([F.col("p_size"), F.col("p_partkey") % 1024], bits=10).alias(
            "zval"
        ),
    )


def _merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge: a deterministic change set (updates for custkey%3==0,
    inserts keyed above the base range for custkey%7==0) applied to the
    customer table — UPDATE on key match, INSERT otherwise."""
    base = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    updates = base.where(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        "c_name",
        (F.col("c_acctbal") + F.lit(100.0)).alias("c_acctbal"),
        F.lit("UPDATED").alias("c_mktsegment"),
    )
    inserts = base.where(F.col("c_custkey") % 7 == 0).select(
        (F.col("c_custkey") + F.lit(1_000_000)).alias("c_custkey"),
        F.concat(F.lit("NEW#"), F.col("c_custkey").cast("string")).alias("c_name"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    return warehouse.merge_upsert(
        base, updates.unionByName(inserts), keys=["c_custkey"]
    )


def _scd2_customer_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 dimension build: each customer's order-priority history
    compressed into validity intervals (the order log as change stream).
    Timestamps are formatted to date strings AFTER versioning — typed
    outputs don't round-trip identically through pandas across engines."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    log = orders.select("o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")
    vers = warehouse.scd2(
        log,
        key="o_custkey",
        attrs=["o_orderpriority"],
        order_col="o_orderdate",
        tiebreak_col="o_orderkey",
    )
    return vers.select(
        "o_custkey",
        "o_orderpriority",
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd").alias("valid_to"),
        "is_current",
    )


def _column_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return warehouse.column_profile(
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        ["o_custkey", "o_orderstatus", "o_orderpriority"],
    )


def _orphan_keys_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    events = _events(spark, sf_dir)
    return warehouse.orphan_check(
        [
            ("lineitem.l_orderkey->orders", lineitem, "l_orderkey", orders, "o_orderkey"),
            ("orders.o_custkey->customer", orders, "o_custkey", customer, "c_custkey"),
            ("events.user_id->customer", events, "user_id", customer, "c_custkey"),
        ]
    )


def _heavy_hitter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return warehouse.heavy_hitters(
        _events(spark, sf_dir), ["user_id"], min_share=0.005
    )


def _shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.hash_shard(_docs(spark, sf_dir), n_shards=32).select(
        "doc_id", "shard"
    )


def _domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.domain_mix(_docs(spark, sf_dir), DOMAIN_QUOTAS).select(
        "doc_id", "lang"
    )


# NOTE on ordering: the driver's correctness harness checks the FIRST 50
# entries of this dict (its iteration order). Queries that changed this
# round, previously-failing queries, and queries with no driver row yet
# sit in the front; long-proven relational queries (green in
# CORRECTNESS_r01) rotate to the back.
def _supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer->supplier purchase graph (top 100 by
    rank). Iterative weighted propagation — see operators/pagerank.py."""
    from pipeline_pyspark_etl_imdb_spark.operators.pagerank import (
        customer_supplier_pagerank,
    )

    return customer_supplier_pagerank(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
    )


def _ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality observability as a first-class query: per-query
    recall@5 of the LSH-ANN path against the exact brute-force ranking.
    Both sides are deterministic (decimal bucket assignment, stable rank
    tie-breaks), so the recall table itself hash-matches the oracle —
    the pattern for continuously monitoring index quality in production
    without a separate evaluation harness."""
    emb = _emb(spark, sf_dir)
    exact = similarity.cosine_knn(emb, k=5, query_ids=KNN_QUERY_IDS).select(
        "query_id", "neighbor_id"
    )
    approx = similarity.ann_lsh_knn(emb, k=5, query_ids=KNN_QUERY_IDS).select(
        "query_id", "neighbor_id"
    )
    hits = (
        exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        exact.groupBy("query_id")
        .agg(F.count("*").alias("n_exact"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_hits", F.lit(0)).cast("int").alias("n_hits"),
            (
                F.coalesce("n_hits", F.lit(0)).cast("double") / F.col("n_exact")
            ).alias("recall_at_5"),
        )
        .orderBy("query_id")
    )


def _embedding_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (transform/filter/aggregate) plus the
    positional array family (size/array_max/array_position) over the
    embedding column — all map-only builtin expressions fused into the
    scan; zero shuffle, zero Python."""
    emb = _emb(spark, sf_dir)
    vec = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(vec).alias("dim"),
        F.size(F.filter(vec, lambda x: x > 0)).alias("n_pos"),
        F.when(
            F.size(vec) > 0,
            F.array_position(vec, F.array_max(vec)).cast("int"),
        ).alias("argmax_idx"),
        F.sqrt(
            F.aggregate(
                F.transform(vec, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("l2_norm"),
    )


def _kmv_user_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user estimate from a KMV sketch. KMV on a
    fixed md5 hash is bit-deterministic, so — unlike the HLL/CMS rows-only
    queries — the SKETCH ESTIMATE itself hash-matches the DuckDB oracle:
    an approximate operator with an exact correctness contract."""
    ev = _events(spark, sf_dir)
    sk = warehouse.kmv_sketch(ev, ["event_type"], "user_id", k=64)
    return warehouse.kmv_estimate(sk, ["event_type"], k=64).orderBy("event_type")


QUERIES: dict[str, QueryFn] = {
    # NOTE: the dict literal below is in historical (r3) order; the
    # DRIVER WINDOW (first 50 names the driver actually checks) is
    # imposed by the _R8_WINDOW reorder at the END of this module —
    # see that block for the staleness-rotation rationale.
    "event_ohlc_bars": _event_ohlc_bars,
    "order_grouping_sets": analytics.order_grouping_sets,
    "orders_above_global_avg": analytics.orders_above_global_avg,
    "event_type_transitions": lambda s, d: journeys.type_transitions(_events(s, d)),
    "session_top_paths": lambda s, d: journeys.session_top_paths(_events(s, d)),
    "embedding_vector_stats": _embedding_vector_stats,
    "user_activity_spans": lambda s, d: eventtime.user_activity_spans(_events(s, d)),
    "global_doc_sample": lambda s, d: corpus.global_hash_sample(_docs(s, d), k=100)
    .select("doc_id", "lang")
    .orderBy("doc_id"),
    "weighted_doc_sample": lambda s, d: corpus.weighted_hash_sample(
        _docs(s, d), k=100, weight_col="n_chars"
    )
    .select("doc_id", "lang")
    .orderBy("doc_id"),
    "daily_orders_vs_events_full": _daily_orders_vs_events_full,
    "doc_segments_udtf": lambda s, d: udtf_ops.segment_documents(
        _docs(s, d), max_tokens=10
    ),
    "events_variant_stats": _events_variant_stats,
    "gopher_quality_flags": lambda s, d: text_ops.gopher_quality_flags(_docs(s, d)),
    "incremental_ingest_dedup": _incremental_ingest_dedup,
    "cms_user_event_counts": _cms_user_event_counts,
    "user_type_share_map": _user_type_share_map,
    "part_string_battery": _part_string_battery,
    "null_safe_bucket_join": _null_safe_bucket_join,
    "customer_snapshot_diff": _customer_snapshot_diff,
    "pipe_priority_revenue": _pipe_priority_revenue,
    "ann_pq": lambda s, d: similarity.ann_pq_knn(
        _emb(s, d), k=5, query_ids=KNN_QUERY_IDS
    ),
    # -- never-driver-checked rows-only (4)
    "stratified_doc_sample": _stratified_doc_sample,
    "doc_classifier_scores": _doc_classifier_scores,
    "supplier_pagerank": _supplier_pagerank,
    "embedding_kmeans": _embedding_kmeans,
    # -- operators touched in r3: shingle df-cap + cached shingles
    #    (jaccard family), tracked persists (similarity family),
    #    guaranteed-count k-means seeding
    # new this round: the complete two-stage LSH->verify dedup pipeline
    # and ANN recall observability, both oracle-backed
    "lsh_verified_pairs": lambda s, d: neardup.lsh_verified_pairs(
        _docs(s, d), threshold=0.8
    ),
    "ann_recall_report": _ann_recall_report,
    # new this round: data-selection battery (operators/importance.py) —
    # DSIR importance weights, substring-level (k-token-span) duplication,
    # staged quality funnel, mixture/epoch planning
    "dsir_doc_weights": lambda s, d: importance.dsir_logweights(
        _docs(s, d), F.col("lang") == "en"
    ),
    "repeated_spans": lambda s, d: importance.repeated_spans(_docs(s, d), k=8),
    "span_dup_coverage": lambda s, d: importance.span_dup_coverage(_docs(s, d), k=8),
    "quality_funnel_report": lambda s, d: importance.quality_funnel(_docs(s, d)),
    "mixing_epochs_plan": lambda s, d: importance.mixing_epochs_plan(
        _docs(s, d), DOMAIN_QUOTAS, 10_000_000
    ),
    # new this round: Spark 4 SQL-surface widening — ordered-set
    # aggregate, recursive CTE, correlated LATERAL top-k
    "nation_customer_roster": _nation_customer_roster,
    "custkey_tree_depth": _custkey_tree_depth,
    "supplier_top_orders_lateral": _supplier_top_orders_lateral,
    "brand_entity_resolution": _brand_entity_resolution,
    "bloom_contamination_check": lambda s, d: corpus.bloom_decontaminate(
        _docs(s, d)
    ),
    "doc_bigram_logprob": lambda s, d: text_ops.bigram_logprob(_docs(s, d)),
    "jaccard_pairs": lambda s, d: neardup.jaccard_pairs(_docs(s, d), k=3, threshold=0.8),
    "minhash_candidates": lambda s, d: neardup.minhash_candidate_pairs(_docs(s, d)),
    # -- newest r3 oracle-backed queries: SemDeDup over deterministic LSH
    #    clusters, KMV distinct sketch (estimate itself hash-matches),
    #    deterministic train/val/test split, k-anonymity release gate,
    #    triangle counting over the part co-purchase graph
    "semdedup_lsh": lambda s, d: semdedup.semdedup_lsh(_emb(s, d), threshold=0.35),
    "kmv_user_sketch": _kmv_user_sketch,
    "dataset_split_assign": lambda s, d: corpus.dataset_split(_docs(s, d))
    .select("doc_id", "lang", "split")
    .orderBy("doc_id"),
    "k_anonymity_customers": lambda s, d: warehouse.k_anonymity_audit(
        s.read.parquet(f"{d}/customer.parquet"), ["c_nationkey", "c_mktsegment"], k=5
    ),
    # part (co-purchase) graph, NOT suppliers: the supplier co-occurrence
    # graph is complete in TPC-H (measured: 77 s at sf0.1 for C(1000,3)
    # triangle enumeration); the part graph is 0.6%-dense and seconds
    "copurchase_triangles": lambda s, d: triangles.triangle_participation(
        triangles.cooccurrence_edges(s.read.parquet(f"{d}/lineitem.parquet"))
    ),
    "embedding_neardup": lambda s, d: similarity.cosine_dup_pairs(_emb(s, d), threshold=0.35),
    "ann_ivf": lambda s, d: similarity.ann_ivf_knn(
        _emb(s, d), k=5, query_ids=KNN_QUERY_IDS
    ),
    # -- r1-green relational surface, re-confirmed post-r2-refactor
    "region_revenue": analytics.region_revenue,
    "skew_safe_flag_totals": lambda s, d: _skew_flag_totals(s, d),
    "skew_safe_status_revenue": lambda s, d: _skew_status_revenue(s, d),
    "top_orders_per_segment_year": analytics.top_orders_per_segment_year,
    "pricing_summary": analytics.pricing_summary,
    "year_order_kpi": analytics.year_order_kpi,
    "dedup_lineitem_latest": analytics.dedup_lineitem_latest,
    "order_price_histogram": analytics.order_price_histogram,
    "distinct_segments": analytics.distinct_segments,
    "part_type_words": analytics.part_type_words,
    "part_word_bridge": analytics.part_word_bridge,
    "null_marker_cast": analytics.null_marker_cast,
    # r1-green re-confirmations displaced from the window by the five
    # newest oracle-backed queries; their code paths (cosine kNN, LSH
    # bucketing, jaccard components) run in-window via lsh_verified_pairs,
    # ann_recall_report, and jaccard_pairs
    "knn_bruteforce": lambda s, d: similarity.cosine_knn(_emb(s, d), k=5, query_ids=KNN_QUERY_IDS),
    "lsh_buckets": lambda s, d: similarity.lsh_bucket(_emb(s, d)),
    "ann_lsh": lambda s, d: similarity.ann_lsh_knn(_emb(s, d), k=5, query_ids=KNN_QUERY_IDS),
    "dedup_components": lambda s, d: components.connected_components(
        neardup.jaccard_pairs(_docs(s, d), k=3, threshold=0.8).select("doc_a", "doc_b")
    ),
    "dedup_canonical_corpus": lambda s, d: components.dedup_canonical(
        _docs(s, d),
        neardup.jaccard_pairs(_docs(s, d), k=3, threshold=0.8).select("doc_a", "doc_b"),
    ),
    # --- BEHIND THE WINDOW (51+): green in CORRECTNESS_r02 (or r01 for
    #     the tail) and continuously re-verified by the local oracle
    #     suite. First four: r1-green, displaced from the window by the
    #     new r3 queries above
    "lineitem_rollup": analytics.lineitem_rollup,
    "sql_segment_leaders": _sql_segment_leaders,
    # new this session, rows-only by design (float-iterative clustering /
    # iterative argmax loop): the literal SemDeDup recipe over k-means
    # clusters, and distributed BPE vocabulary learning. Both pinned
    # bit-exact against independent Python/NumPy references in
    # tests/test_semdedup.py and tests/test_bpe.py.
    "semdedup_kmeans": lambda s, d: semdedup.semdedup_kmeans(
        _emb(s, d), k=16, n_iter=3, threshold=0.35
    ),
    "bpe_merge_table": lambda s, d: bpe.bpe_merge_table(_docs(s, d), n_merges=8),
    "bpe_token_counts": lambda s, d: bpe.bpe_token_counts(_docs(s, d), n_merges=8),
    # r6 addition (driver-green in the r6 window): tokenizer fertility by
    # source — subword tokens per word per corpus slice, the multilingual
    # over-fragmentation report; exact sums + correctly-rounded divisions
    "bpe_source_fertility": lambda s, d: bpe.bpe_source_fertility(
        _docs(s, d), n_merges=8
    ),
    # new this session, oracle-backed, queued for the r4 window: Okapi
    # BM25 retrieval scoring, l-diversity release gate, deterministic
    # contrastive hard-negative sampling
    "bm25_docs": lambda s, d: text_ops.bm25_scores(
        _docs(s, d), ["vector", "hash", "merge"]
    ),
    "l_diversity_customers": lambda s, d: warehouse.l_diversity_audit(
        s.read.parquet(f"{d}/customer.parquet"),
        ["c_nationkey"],
        "c_mktsegment",
        l=5,
    ),
    "contrastive_doc_negatives": lambda s, d: corpus.contrastive_negatives(
        _docs(s, d), anchor_ids=[1, 2, 3, 4, 5, 6, 7, 8], k=5
    ),
    # passage-level retrieval (chunk + BM25 + global top-k) — oracle-backed
    "rag_chunk_bm25": lambda s, d: text_ops.rag_chunk_bm25(
        _docs(s, d), ["vector", "hash", "merge"], k=20
    ),
    # embedding compression battery — oracle-backed: symmetric int8 codes
    # + reconstruction MSE, and Matryoshka dim-truncation retrieval recall.
    # Driver-facing shape is EXPLODED to scalar rows (vec_id, dim_idx,
    # code, mse) — the driver's canonicalizer cannot sort array cells
    # (media_features precedent, ROUND2_NOTES.md); the array-form
    # operator API is unchanged for library callers.
    "embedding_int8_quantize": lambda s, d: quantize.int8_quantize(_emb(s, d))
    .select(
        "vec_id", F.posexplode("qvec").alias("dim_idx", "code"), "mse"
    )
    .withColumn("dim_idx", F.col("dim_idx").cast("int")),
    "matryoshka_recall16": lambda s, d: quantize.matryoshka_recall(
        _emb(s, d), trunc_dim=16, k=5, query_ids=KNN_QUERY_IDS
    ),
    # quality-curriculum staging (quality_expr x distributed ntile)
    "curriculum_stages": lambda s, d: corpus.curriculum_stages(_docs(s, d)),
    # grouped closed-form OLS (one partial-agg groupBy, exact decimal sums)
    "segment_price_trend": analytics.segment_price_trend,
    # model-eval battery — oracle-backed: rank-sum AUC via the distributed
    # global rank, and a one-pass multi-threshold operating-point table
    # (score = quality_expr, label = lang=='en')
    "quality_auc": lambda s, d: evalmetrics.rank_sum_auc(
        _docs(s, d).select(
            "doc_id",
            text_ops.quality_expr(F.col("text")).alias("quality"),
            (F.col("lang") == "en").alias("is_en"),
        ),
        "quality",
        "is_en",
        "doc_id",
    ),
    # EXACT set-similarity join via prefix filtering (PPJoin family) —
    # deterministic candidates, no probabilistic recall; output equals
    # jaccard_pairs so the oracle is the same naive formulation
    "prefix_filter_pairs": lambda s, d: neardup.prefix_filter_pairs(
        _docs(s, d), k=3, threshold=0.8
    ),
    # perceptual image/audio fingerprints over REAL BMP/WAV payloads
    # (stdlib codecs) — oracle-backed: the payload bytes derive
    # deterministically from documents.text, so the SQL oracle replays
    # pixel/sample extraction from hex(encode(text)) and the kernels'
    # integer-exact threshold rules (see plans/oracles.py); NumPy
    # reference + invariance also pinned in tests/test_ahash.py
    "media_ahash_values": lambda s, d: multimodal.media_ahash(
        multimodal.media_real_containers(_docs(s, d))
    ).orderBy("media_id"),
    "media_audio_fingerprints": lambda s, d: multimodal.media_audio_fingerprint(
        multimodal.media_real_containers(_docs(s, d))
    ).orderBy("media_id"),
    # calibration + drift monitoring over the quality score
    "quality_calibration": lambda s, d: evalmetrics.calibration_bins(
        _docs(s, d).select(
            text_ops.quality_expr(F.col("text")).alias("quality"),
            (F.col("lang") == "en").alias("is_en"),
        ),
        "quality",
        "is_en",
        n_bins=10,
    ),
    "quality_psi_drift": lambda s, d: evalmetrics.psi_drift(
        _docs(s, d).select(
            text_ops.quality_expr(F.col("text")).alias("quality"),
            (F.col("doc_id") % 2 == 0).alias("half"),
        ),
        "quality",
        "half",
        n_bins=10,
    ),
    # KMV set-operation estimate: audience overlap between event types
    # (deterministic md5 sketches — the estimate itself hash-matches)
    "event_audience_overlap": lambda s, d: warehouse.kmv_jaccard_pairs(
        _events(s, d), "event_type", "user_id", k=64
    ),
    # Zipf's-law corpus-health fit (vocab groupBy x distributed rank x OLS)
    "vocab_zipf_fit": lambda s, d: text_ops.vocab_zipf_fit(_docs(s, d)),
    # first-fit-decreasing sequence packing — sequential per shard, so
    # Arrow-batched applyInPandas; rows-only (FFD is not SQL-expressible),
    # invariant + Python-reference pinned in tests/test_packing.py
    "pack_best_fit_assignment": lambda s, d: corpus.pack_best_fit(
        _docs(s, d)
    ).orderBy("doc_id"),
    "quality_threshold_metrics": lambda s, d: evalmetrics.threshold_metrics(
        _docs(s, d).select(
            text_ops.quality_expr(F.col("text")).alias("quality"),
            (F.col("lang") == "en").alias("is_en"),
        ),
        "quality",
        "is_en",
        [0.4, 0.5, 0.6, 0.7],
    ),
    # k-core of the part co-purchase graph — integer-only synchronous
    # peel, oracle-backed via 50 unrolled live-set refinement rounds
    # (the Spark operator's max_iter contract); also Python-reference-
    # pinned in tests/test_kcore.py
    "copurchase_k_core": lambda s, d: kcore.k_core(
        triangles.cooccurrence_edges(s.read.parquet(f"{d}/lineitem.parquet")),
        k=80,
        # cooccurrence_edges emits each a<b pair exactly once, so the
        # symmetrize-dedup shuffle is provably redundant here
        edges_distinct=True,
    ),
    # prototypicality pruning signal (SemDeDup/CLIP-score family):
    # cosine to the per-label centroid; DECIMAL-exact centroid sums make
    # the whole score chain bit-identical cross-engine (oracle-backed,
    # unlike the float-mean k-means family)
    "embedding_prototype_scores": lambda s, d: prototypes.centroid_cosine_scores(
        _emb(s, d), dim=64
    ),
    # link prediction on a deterministic 1/4-node subgraph of the
    # co-purchase graph: the wedge-stream cost is already measured by
    # copurchase_triangles, so the registry query scores links on the
    # mod-sampled subgraph to keep the bench additive; the operator is
    # generic over any (src < dst) edge list
    "copurchase_link_prediction": lambda s, d: triangles.common_neighbor_links(
        triangles.cooccurrence_edges(
            s.read.parquet(f"{d}/lineitem.parquet").where(F.col("l_partkey") % 4 == 0)
        ),
        top_n=100,
    ),
    # Page's CUSUM drift detector, batch form: per-user peak |running
    # sum of (value - global mean)| — one user-keyed Exchange, two
    # windows on it
    "event_cusum_changepoints": lambda s, d: eventtime.cusum_changepoints(
        _events(s, d)
    ),
    # recency-weighted engagement; rational decay keeps the float chain
    # bit-identical cross-engine (exp() is libm-dependent)
    "decayed_user_engagement": lambda s, d: eventtime.decayed_user_value(
        _events(s, d), horizon_days=7.0
    ),
    # order-3 sequential-pattern counts (behavioral n-gram features)
    "event_type_trigrams": lambda s, d: journeys.type_kgrams(
        _events(s, d), k=3, top=20
    ),
    # distinct-n corpus-health diversity per language (Li et al. 2016)
    "lang_ngram_diversity": lambda s, d: text_ops.ngram_diversity(
        _docs(s, d), group_col="lang", max_n=3
    ),
    # tokenizer application: per-doc token budgets from the trained BPE
    # (rows-only — the merge list comes from the iterative trainer;
    # pinned against a pure-Python encode in tests/test_bpe.py)
    "bpe_doc_token_budget": lambda s, d: bpe.bpe_encode_docs(
        _docs(s, d), n_merges=8
    ).orderBy("doc_id"),
    # U-shaped multi-touch attribution (asof last-click generalized)
    "revenue_attribution_ushape": lambda s, d: attribution.position_based_attribution(
        _events(s, d)
    ),
    # A-priori k=2: co-purchase support/confidence/lift (integer-exact)
    "part_association_rules": lambda s, d: basket.association_rules(
        s.read.parquet(f"{d}/lineitem.parquet"), min_support=2, top_n=100
    ),
    # class-separability: pairwise centroid cosines (k x k, tiny)
    "label_confusion_report": lambda s, d: prototypes.label_confusion_matrix(
        _emb(s, d), dim=64
    ),
    # exact interpolated tail bands — the oracle-able twin of the
    # approx_percentile scale path
    "event_value_bands": lambda s, d: eventtime.value_percentile_bands(
        _events(s, d)
    ),
    # estimator-quality report: MinHash estimate vs exact Jaccard on the
    # banding candidates (how a 100 TB run tunes n_hashes/threshold)
    "minhash_jaccard_estimates": lambda s, d: neardup.minhash_jaccard_estimates(
        _docs(s, d)
    ),
    # multiplicative weekly seasonal profile (integer-day dow, no tz)
    "event_dow_seasonality": lambda s, d: eventtime.dow_seasonality(_events(s, d)),
    # inverted-index sparse cosine join (df-fraction cap = the skew lever)
    "tfidf_cosine_pairs": lambda s, d: neardup.tfidf_cosine_pairs(_docs(s, d)),
    # RAG retrieval stack: reciprocal-rank fusion of BM25 + embedding
    # cosine (rank-based, so no cross-system score calibration needed)
    "hybrid_rrf_retrieval": lambda s, d: retrieval.hybrid_rrf(
        _docs(s, d), _emb(s, d), ["vector", "hash", "merge"]
    ),
    # deterministic md5-bucketed A/B with a two-proportion z-test
    "ab_experiment_report": lambda s, d: abtest.ab_experiment_report(_events(s, d)),
    # funnel latency distribution (exact interpolated percentiles)
    "funnel_time_to_convert": lambda s, d: abtest.time_to_convert(_events(s, d)),
    # unigram-LM tokenizer training (SentencePiece hard-EM) — the fifth
    # iterative shape; rows-only (iterative Viterbi rounds are not one
    # SQL query), pinned in tests/test_unigram_lm.py
    "unigram_lm_vocab": lambda s, d: unigram_lm.unigram_lm_train(
        _docs(s, d), seed_size=1500, vocab_size=400, n_iters=2
    ),
    # multi-signal dedup disagreement report (text LSH-verified pairs
    # full-outer embedding-cosine pairs, doc_id == vec_id alignment)
    "dedup_signal_consensus": lambda s, d: neardup.dedup_signal_consensus(
        _docs(s, d), _emb(s, d)
    ),
    # whale-curve Pareto report (distributed ranks, one conditional-sum
    # pass for all thresholds)
    "revenue_concentration": lambda s, d: warehouse.revenue_concentration(
        s.read.parquet(f"{d}/orders.parquet")
    ),
    # sketch-based join-size estimation (planning observability):
    # orders x lineitem on orderkey, 1/16 key-cut sample vs exact
    "join_size_estimate_ol": lambda s, d: warehouse.join_size_estimate(
        s.read.parquet(f"{d}/orders.parquet"),
        s.read.parquet(f"{d}/lineitem.parquet"),
        "o_orderkey",
        "l_orderkey",
    ),
    # split-conformal quality gate: exact order-statistic cutoffs with
    # finite-sample correction over an md5 calibration split
    "quality_conformal_gate": lambda s, d: evalmetrics.conformal_cutoff(
        _docs(s, d).select(
            "doc_id", text_ops.quality_expr(F.col("text")).alias("quality")
        ),
        "quality",
        id_col="doc_id",
    ),
    # lang-id confusion matrix vs the labeled language column
    "lang_id_confusion": lambda s, d: text_ops.lang_confusion(_docs(s, d)),
    # chance-corrected agreement for the same prediction chain
    "lang_id_kappa": lambda s, d: text_ops.lang_id_kappa(_docs(s, d)),
    # Kaplan-Meier retention (product-limit estimator, right-censored)
    "user_km_retention": lambda s, d: eventtime.km_retention(
        _events(s, d), censor_window_s=6 * 3600
    ),
    # PAV isotonic calibration of the quality score against is-English
    # (oracle-backed via the PAV = minimax identity; Python-pinned too)
    "quality_isotonic_calibration": lambda s, d: evalmetrics.isotonic_calibration(
        _docs(s, d).select(
            text_ops.quality_expr(F.col("text")).alias("quality"),
            (F.col("lang") == "en").alias("is_en"),
        ),
        "quality",
        "is_en",
        n_bins=10,
    ),
    "orders_with_lineitems_semi": analytics.orders_with_lineitems_semi,
    "customers_without_orders_anti": analytics.customers_without_orders_anti,
    # --- green in CORRECTNESS_r02 (or r01 for
    # the tail) and continuously re-verified by the local oracle suite
    "purchase_last_click_asof": analytics.purchase_last_click_asof,
    "purchases_near_errors": lambda s, d: _purchases_near_errors(s, d),
    "approx_user_stats": _approx_user_stats,
    "event_value_stats": _event_value_stats,
    "media_features": lambda s, d: multimodal.media_features(
        multimodal.media_from_documents(_docs(s, d)), dim=16
    ).select(
        "media_id", F.posexplode("features").alias("bucket_idx", "feature")
    ).withColumn("bucket_idx", F.col("bucket_idx").cast("int")),
    "media_decode_real": lambda s, d: multimodal.decode_media(
        multimodal.media_real_containers(_docs(s, d)), codec="real"
    ),
    "ema_user_value": _ema_user_value,
    "events_props_struct": _events_props_struct,
    "order_calendar_profile": _order_calendar_profile,
    "trailing_week_spend": _trailing_week_spend,
    "part_name_features": _part_name_features,
    "events_tumbling_kpi": lambda s, d: eventtime.tumbling_kpi(_events(s, d)),
    "events_hourly_rollup": lambda s, d: eventtime.rollup_coarser(
        eventtime.tumbling_kpi(_events(s, d), width_s=600, value_as_decimal=True),
        600,
        3600,
    ),
    "events_sliding_counts": lambda s, d: eventtime.sliding_kpi(_events(s, d)),
    "events_sessionize": lambda s, d: eventtime.sessionize(_events(s, d)),
    "events_json_kpi": lambda s, d: eventtime.json_value_kpi(_events(s, d)),
    "events_user_pivot": lambda s, d: eventtime.user_type_pivot(_events(s, d)),
    "event_counts_unpivot": _event_counts_unpivot,
    "repetition_score": lambda s, d: text_ops.repetition_score(_docs(s, d)),
    "pii_redact": lambda s, d: text_ops.pii_redact(_docs(s, d)),
    "ngram_stats": lambda s, d: text_ops.ngram_stats(_docs(s, d), top=100),
    "tfidf_top_terms": lambda s, d: text_ops.tfidf_top_terms(_docs(s, d), k=3),
    "shard_assignment": _shard_assignment,
    "domain_mix": _domain_mix,
    "sequence_packing": lambda s, d: corpus.pack_concat_split(
        _docs(s, d), budget_tokens=512, n_shards=8
    ),
    "contamination_check": lambda s, d: corpus.contamination_check(
        _docs(s, d), benchmark_ids_mod=20, k=5
    ),
    "merge_upsert_customers": _merge_upsert_customers,
    "scd2_customer_priority": _scd2_customer_priority,
    "column_profile_orders": _column_profile_orders,
    "orphan_keys_qa": _orphan_keys_qa,
    "heavy_hitter_users": _heavy_hitter_users,
    "vocab_top_tokens": lambda s, d: text_ops.vocab_build(_docs(s, d), size=500),
    "doc_unigram_logprob": lambda s, d: text_ops.unigram_logprob(_docs(s, d)),
    "doc_chunks": lambda s, d: corpus.chunk_documents(
        _docs(s, d), max_tokens=64, overlap=8
    ),
    "group_doc_sample": lambda s, d: corpus.group_hash_sample(
        _docs(s, d), "lang", k=20
    ).select("doc_id", "lang"),
    "corpus_build_manifest": lambda s, d: corpus.corpus_build(
        _docs(s, d), DOMAIN_QUOTAS, quality_min=0.5, n_shards=32
    ),
    "customer_spend_deciles": analytics.customer_spend_deciles,
    "events_gap_fill": analytics.events_gap_fill,
    "funnel_view_click_purchase": lambda s, d: journeys.funnel(
        _events(s, d), FUNNEL_STEPS
    ),
    "cohort_weekly_retention": lambda s, d: journeys.cohort_retention(_events(s, d)),
    "user_inter_arrival": lambda s, d: journeys.inter_arrival(_events(s, d)),
    "chunk_dedup_corpus": lambda s, d: corpus.chunk_exact_dedup(
        _docs(s, d), chunk_tokens=16
    ),
    "incremental_daily_kpi": _incremental_daily_kpi,
    "distinct_users_sketch": _distinct_users_sketch,
    "token_feature_hash": lambda s, d: text_ops.feature_hash_tokens(
        _docs(s, d), n_buckets=64
    ),
    "part_zorder_key": _part_zorder_key,
    "event_value_anomalies": _event_value_anomalies,
    "brand_fuzzy_pairs": _brand_fuzzy_pairs,
    "winsorized_price_stats": analytics.winsorized_price_stats,
    "order_gap_profile": analytics.order_gap_profile,
    "text_stats": lambda s, d: text_ops.text_stats(_docs(s, d)),
    "subtoken_count": lambda s, d: text_ops.subtoken_count(_docs(s, d)),
    "quality_score": lambda s, d: text_ops.quality_score(_docs(s, d)),
    "lang_id": lambda s, d: text_ops.lang_id(_docs(s, d)),
    "doc_fingerprint": lambda s, d: text_ops.doc_fingerprint(_docs(s, d)),
    "exact_dup_groups": lambda s, d: neardup.exact_dup_groups(_docs(s, d)),
    "simhash_values": lambda s, d: neardup.simhash32(_docs(s, d)),
    "simhash_pairs": lambda s, d: neardup.simhash_pairs(_docs(s, d), max_hamming=1),
    "media_stats": lambda s, d: multimodal.media_stats(
        multimodal.media_from_documents(_docs(s, d))
    ),
    "media_decode": lambda s, d: multimodal.decode_media(
        multimodal.media_from_documents(_docs(s, d))
    ),
    "media_frames": lambda s, d: multimodal.sample_frames(
        multimodal.media_from_documents(_docs(s, d))
    ).select("media_id", "frame_idx", F.md5("frame").alias("frame_md5")),
    "media_resize": lambda s, d: multimodal.resize_media(
        multimodal.media_from_documents(_docs(s, d)), target_w=8, target_h=8
    ).select("media_id", "width", "height", F.md5("resized").alias("resized_md5")),
    "return_share_by_year": analytics.return_share_by_year,
    "forecast_revenue_change": analytics.forecast_revenue_change,
    "revenue_yoy": analytics.revenue_yoy,
    "customer_running_spend": analytics.customer_running_spend,
    "segment_price_quantiles": analytics.segment_price_quantiles,
    "order_status_priority_cube": analytics.order_status_priority_cube,
    "customer_order_profile_left": analytics.customer_order_profile_left,
    "nation_role_set_ops": analytics.nation_role_set_ops,
    "event_key_skew_profile": lambda s, d: warehouse.key_skew_profile(
        _events(s, d), "user_id", top_n=20
    ),
    "temperature_mixing_plan": lambda s, d: importance.temperature_mix_plan(
        _docs(s, d), token_budget=1_000_000
    ),
    "quality_token_budget": lambda s, d: corpus.select_to_token_budget(
        _docs(s, d), token_budget=20_000
    ),
    # driver-facing shape exploded to scalar (vec_id, dim_idx, value)
    # rows — same media_features precedent as embedding_int8_quantize
    "embedding_jl_projection": lambda s, d: quantize.jl_project(
        _emb(s, d), in_dim=64, out_dim=16
    )
    .select("vec_id", F.posexplode("projection").alias("dim_idx", "value"))
    .withColumn("dim_idx", F.col("dim_idx").cast("int")),
    "kcenter_diversity_picks": lambda s, d: diversity.kcenter_select(
        _emb(s, d), k=8
    ),
    "span_dedup_trim": lambda s, d: importance.span_dedup_trim(_docs(s, d)),
    "lineitem_exact_median": lambda s, d: selection.exact_median_report(
        s.read.parquet(f"{d}/lineitem.parquet"), "l_extendedprice"
    ),
    "status_exact_median": lambda s, d: selection.grouped_exact_median_report(
        s.read.parquet(f"{d}/orders.parquet"), "o_orderstatus", "o_totalprice"
    ),
    "cuped_experiment_report": lambda s, d: abtest.cuped_report(_events(s, d)),
    "incremental_join_delta": _incremental_join_delta,
    "signed_join_refresh": _signed_join_refresh,
    "signed_daily_kpi_refresh": _signed_daily_kpi_refresh,
    "orders_pit_priority": _orders_pit_priority,
    "lang_token_entropy": lambda s, d: text_ops.lang_token_entropy(_docs(s, d)),
    "revenue_seasonal_decomposition": analytics.revenue_seasonal_decomposition,
    "neyman_order_sample": lambda s, d: corpus.neyman_stratified_sample(
        s.read.parquet(f"{d}/orders.parquet"),
        "o_orderstatus",
        "o_totalprice",
        total_n=300,
        id_col="o_orderkey",
    ),
    "event_value_mad_anomalies": lambda s, d: selection.mad_anomaly_report(
        _events(s, d), "event_id", "value"
    ),
    # z_cut=1.3: TPC-H prices are near-uniform (robust z maxes out at
    # ~1.38 — a bounded distribution has no 3-sigma tail), so the cut
    # sits just inside the extremes to exercise the per-group machinery
    "status_price_mad_anomalies": lambda s, d: selection.grouped_mad_anomaly_report(
        s.read.parquet(f"{d}/orders.parquet"),
        "o_orderstatus",
        "o_orderkey",
        "o_totalprice",
        z_cut=1.3,
    ),
    "retrieval_ndcg_report": lambda s, d: evalmetrics.ranking_eval(
        _emb(s, d), query_ids=KNN_QUERY_IDS, k=10
    ),
    "orders_contract_report": lambda s, d: warehouse.expectation_report(
        s.read.parquet(f"{d}/orders.parquet"),
        [
            ("totalprice_positive", F.col("o_totalprice") > 0),
            ("orderdate_not_null", F.col("o_orderdate").isNotNull()),
            ("status_in_domain", F.col("o_orderstatus").isin("O", "F", "P")),
            ("custkey_positive", F.col("o_custkey") > 0),
            ("priority_prefixed", F.col("o_orderpriority").rlike("^[1-5]-")),
        ],
    ),
    "lineitem_weighted_median": lambda s, d: selection.weighted_exact_median_report(
        s.read.parquet(f"{d}/lineitem.parquet"), "l_extendedprice", "l_quantity"
    ),
    "status_price_quantile_sketch": lambda s, d: warehouse.hash_sample_quantile_sketch(
        s.read.parquet(f"{d}/orders.parquet"),
        ["o_orderstatus"],
        "o_totalprice",
        ["o_orderkey"],
    ).orderBy("o_orderstatus"),
}

# Queries whose results can't hash-match an external engine: sketch-based
# estimates are implementation-specific. The driver applies the weaker
# rows-only check; tests/test_approx.py bounds the estimation error.
ROWS_ONLY: tuple[str, ...] = (
    "approx_user_stats",
    "stratified_doc_sample",
    "distinct_users_sketch",
    "doc_classifier_scores",
    # supplier_pagerank converted to oracle-backed in r5: the fixed-count
    # float iteration has no comparisons, so cross-engine sum-order spread
    # (~1e-15) is invisible at the protocol's 6-decimal rounding and the
    # measured top-100 cut margin (4.6e-9 at sf0.1) is engine-stable.
    # embedding_kmeans / semdedup_kmeans converted in r6 by the same
    # discipline: integer/boolean outputs, and every float comparison
    # (argmin assignment, cos >= 0.35 prune) measured >= 8.5e-7 relative
    # margin at all three SFs — 5+ orders above cross-engine sum-order
    # spread (see oracles._kmeans_assign_cte)
    # the BPE trio (merge_table / token_counts / doc_token_budget) left
    # this list in r6: the integer-exact merge sequence unrolls as
    # MATERIALIZED CTE rounds and the greedy merge fold becomes a
    # delimited-symbol string replace — see plans/oracles.py _bpe_rounds_sql
    "pack_best_fit_assignment",
    "unigram_lm_vocab",
    # kcenter_diversity_picks converted in r6 (oracles._kcenter_sql):
    # fixed k-1 argmax rounds unroll as CTEs; measured argmax gaps
    # >= 1.2e-3 and rounding-boundary distances >= 3.4e-8 — both 6+
    # orders above cross-engine float spread
    # zlib is not SQL-expressible; pinned against direct zlib.compress
    "doc_compression_ratio",
)


# --- R9 DRIVER WINDOW -----------------------------------------------------
# First CHANGE-AWARE rotation (VERDICT r8 item #1): staleness.propose_window
# now promotes queries whose reachable call-graph nodes (function-level AST
# diff between round-marker commits) changed since their last green driver
# row — a green row certifies the code AS OF that round, so a later change
# to any function on the query's plan path is unverified-code debt that
# outranks plain staleness. This tuple IS the tool's emission, verbatim:
#   slots 1-2   — copurchase_sssp + copurchase_label_reachability,
#                 NEW this round (never-green rows enter at the head
#                 — zero-visibility-debt);
#   slots 3-27  — changed-since-green, staleness-ordered: the three r8
#                 materialize_input callers (vocab_coverage_curve,
#                 token_gini_concentration, vocab_zipf_fit — the verdict's
#                 named instance, promoted via ranks.total_order_ranks +
#                 their text.py bodies), the total_order_ranks caller
#                 family (deciles/rfm/concentration/lift), evalmetrics r7
#                 edits (AUC/confusion/conformal), pagerank/kmeans/
#                 kcenter/multimodal r6-r7 edits, triangles/hex_uniform
#                 r4-r6 edits;
#   slots 28-50 — unchanged-since-green by staleness: the 6 remaining
#                 r3-green rows, then r4-green rows in registry order.
_R9_WINDOW: tuple[str, ...] = (
    "copurchase_sssp",  # last green never
    "copurchase_label_reachability",  # last green never
    "kmv_user_sketch",  # last green r3; CHANGED since
    "dataset_split_assign",  # last green r3; CHANGED since
    "copurchase_triangles",  # last green r3; CHANGED since
    "quality_auc",  # last green r4; CHANGED since
    "vocab_zipf_fit",  # last green r4; CHANGED since
    "label_confusion_report",  # last green r4; CHANGED since
    "quality_conformal_gate",  # last green r4; CHANGED since
    "curriculum_stages",  # last green r5; CHANGED since
    "media_ahash_values",  # last green r5; CHANGED since
    "media_audio_fingerprints",  # last green r5; CHANGED since
    "revenue_concentration",  # last green r5; CHANGED since
    "customer_spend_deciles",  # last green r5; CHANGED since
    "embedding_jl_projection",  # last green r5; CHANGED since
    "customer_rfm_scores",  # last green r5; CHANGED since
    "doc_char_concentration",  # last green r5; CHANGED since
    "token_gini_concentration",  # last green r5; CHANGED since
    "doclen_hill_tail",  # last green r5; CHANGED since
    "theilsen_revenue_trend",  # last green r5; CHANGED since
    "vocab_coverage_curve",  # last green r5; CHANGED since
    "quality_decile_lift",  # last green r5; CHANGED since
    "supplier_pagerank",  # last green r6; CHANGED since
    "embedding_kmeans",  # last green r6; CHANGED since
    "semdedup_kmeans",  # last green r6; CHANGED since
    "kcenter_diversity_picks",  # last green r6; CHANGED since
    "quality_quantile_normalized",  # last green r6; CHANGED since
    "doc_bigram_logprob",  # last green r3
    "semdedup_lsh",  # last green r3
    "embedding_neardup",  # last green r3
    "region_revenue",  # last green r3
    "skew_safe_flag_totals",  # last green r3
    "skew_safe_status_revenue",  # last green r3
    "k_anonymity_customers",  # last green r4
    "bm25_docs",  # last green r4
    "l_diversity_customers",  # last green r4
    "rag_chunk_bm25",  # last green r4
    "matryoshka_recall16",  # last green r4
    "segment_price_trend",  # last green r4
    "quality_calibration",  # last green r4
    "quality_psi_drift",  # last green r4
    "quality_threshold_metrics",  # last green r4
    "embedding_prototype_scores",  # last green r4
    "copurchase_link_prediction",  # last green r4
    "event_cusum_changepoints",  # last green r4
    "revenue_attribution_ushape",  # last green r4
    "part_association_rules",  # last green r4
    "minhash_jaccard_estimates",  # last green r4
    "tfidf_cosine_pairs",  # last green r4
    "hybrid_rrf_retrieval",  # last green r4
)

# --- retired R8 window (kept for the rotation record) ---------------------
# The driver hash-checks the FIRST 50 entries of QUERIES at sf0.01 each
# round. Pure staleness-ordered rotation, continued from r7 (VERDICT r7
# item #2: "staleness.py already emits the correct r8 rotation — just
# run it"); this tuple IS that emission, verbatim:
#   slots 1-20  — all 20 queries whose last green driver row is r2
#                 (the r7 window took the other 19 r2 rows): EMA /
#                 trailing-window / inter-arrival event ops, calendar
#                 profiles, funnel + cohort retention, chunk dedup,
#                 incremental KPI, feature hashing, z-order, fuzzy
#                 brand pairs, QA orphan keys, unigram logprob;
#   slots 21-50 — the first 30 of the 39 r3-green rows in registry
#                 order: OHLC / grouping-sets / transitions analytics,
#                 sampling family, UDTF segments, variant stats,
#                 Gopher flags, CMS/map-aggregates, string battery,
#                 null-safe joins, snapshot diff, ANN recall, DSIR,
#                 span dedup, quality funnel, mixing plan, rosters,
#                 recursive depth, lateral top-k, entity resolution,
#                 bloom contamination. The 9 r3-green rows that did
#                 not fit head the r9 rotation.
_R8_WINDOW: tuple[str, ...] = (
    "event_value_stats",  # last green r2
    "media_features",  # last green r2
    "media_decode_real",  # last green r2
    "ema_user_value",  # last green r2
    "order_calendar_profile",  # last green r2
    "trailing_week_spend",  # last green r2
    "part_name_features",  # last green r2
    "orphan_keys_qa",  # last green r2
    "doc_unigram_logprob",  # last green r2
    "group_doc_sample",  # last green r2
    "funnel_view_click_purchase",  # last green r2
    "cohort_weekly_retention",  # last green r2
    "user_inter_arrival",  # last green r2
    "chunk_dedup_corpus",  # last green r2
    "incremental_daily_kpi",  # last green r2
    "token_feature_hash",  # last green r2
    "part_zorder_key",  # last green r2
    "event_value_anomalies",  # last green r2
    "brand_fuzzy_pairs",  # last green r2
    "order_gap_profile",  # last green r2
    "event_ohlc_bars",  # last green r3
    "order_grouping_sets",  # last green r3
    "orders_above_global_avg",  # last green r3
    "event_type_transitions",  # last green r3
    "embedding_vector_stats",  # last green r3
    "user_activity_spans",  # last green r3
    "global_doc_sample",  # last green r3
    "weighted_doc_sample",  # last green r3
    "daily_orders_vs_events_full",  # last green r3
    "doc_segments_udtf",  # last green r3
    "events_variant_stats",  # last green r3
    "gopher_quality_flags",  # last green r3
    "incremental_ingest_dedup",  # last green r3
    "cms_user_event_counts",  # last green r3
    "user_type_share_map",  # last green r3
    "part_string_battery",  # last green r3
    "null_safe_bucket_join",  # last green r3
    "customer_snapshot_diff",  # last green r3
    "pipe_priority_revenue",  # last green r3
    "ann_recall_report",  # last green r3
    "dsir_doc_weights",  # last green r3
    "repeated_spans",  # last green r3
    "span_dup_coverage",  # last green r3
    "quality_funnel_report",  # last green r3
    "mixing_epochs_plan",  # last green r3
    "nation_customer_roster",  # last green r3
    "custkey_tree_depth",  # last green r3
    "supplier_top_orders_lateral",  # last green r3
    "brand_entity_resolution",  # last green r3
    "bloom_contamination_check",  # last green r3
)

# retired r7 window, kept for the record (tests assert the ACTIVE window
# matches the staleness emission; the historical tuples document the
# rotation's trajectory)
_R7_WINDOW: tuple[str, ...] = (
    # rows-only refreshes (stalest driver signal in the registry)
    "approx_user_stats",
    "distinct_users_sketch",
    "stratified_doc_sample",
    "doc_classifier_scores",
    # last-green r1: reference IMDb surface + core analytics
    "year_order_kpi",
    "order_price_histogram",
    "distinct_segments",
    "part_type_words",
    "part_word_bridge",
    "lineitem_rollup",
    "orders_with_lineitems_semi",
    "customers_without_orders_anti",
    "return_share_by_year",
    "forecast_revenue_change",
    "revenue_yoy",
    "customer_running_spend",
    "order_status_priority_cube",
    "customer_order_profile_left",
    "nation_role_set_ops",
    "sql_segment_leaders",
    # last-green r1: text analysis + fingerprints + multimodal
    "text_stats",
    "subtoken_count",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
    "simhash_values",
    "simhash_pairs",
    "media_stats",
    "media_decode",
    "media_frames",
    "media_resize",
    # last-green r2: event-time battery
    "events_tumbling_kpi",
    "events_hourly_rollup",
    "events_sliding_counts",
    "events_json_kpi",
    "events_user_pivot",
    "event_counts_unpivot",
    "events_props_struct",
    "events_gap_fill",
    # last-green r2: as-of / range joins
    "purchase_last_click_asof",
    "purchases_near_errors",
    # last-green r2: corpus construction
    "shard_assignment",
    "domain_mix",
    "sequence_packing",
    "corpus_build_manifest",
    "doc_chunks",
    # last-green r2: remaining text ops
    "ngram_stats",
    "pii_redact",
    "repetition_score",
    "vocab_top_tokens",
)

# (window reorder applied at module end, after the late registrations
#  below exist in QUERIES)


# --- late-r4 additions --------------------------------------------------
# Growth stays capped below the 50-slot verification rate (VERDICT r3
# item #2, re-affirmed r4 item #4): every oracle-backed query below went
# driver-green by r6 via the r5/r6 windows; they now ride the normal
# staleness rotation.
def _status_price_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_pyspark_etl_imdb_spark.operators.selection import (
        grouped_exact_iqr_report,
    )

    return grouped_exact_iqr_report(
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        "o_orderstatus",
        "o_totalprice",
    ).orderBy("o_orderstatus")


def _lineitem_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_pyspark_etl_imdb_spark.operators.selection import (
        trimmed_mean_report,
    )

    return trimmed_mean_report(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"), "l_extendedprice"
    )


def _lang_source_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_pyspark_etl_imdb_spark.operators.evalmetrics import (
        contingency_stats,
    )

    return contingency_stats(_docs(spark, sf_dir), "lang", "source")


def _token_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_pyspark_etl_imdb_spark.operators.text import token_pmi_pairs

    return token_pmi_pairs(_docs(spark, sf_dir), min_count=5, top=50)


def _doc_char_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-concentration health check: what share of the corpus's
    characters sit in the top-x% largest documents — the same whale-curve
    primitive as revenue_concentration, pointed at training data (a
    too-steep curve means a handful of megadocs dominate the token
    budget)."""
    out = warehouse.revenue_concentration(
        _docs(spark, sf_dir), key_col="doc_id", value_col="n_chars"
    )
    return out.select(
        "top_pct",
        "n_top",
        F.col("revenue_top").alias("chars_top"),
        "share",
    )


QUERIES["status_price_iqr"] = _status_price_iqr
QUERIES["lineitem_trimmed_mean"] = _lineitem_trimmed_mean
QUERIES["lang_source_contingency"] = _lang_source_contingency
QUERIES["token_pmi_pairs"] = _token_pmi_pairs
QUERIES["customer_rfm_scores"] = analytics.customer_rfm_scores
QUERIES["doc_char_concentration"] = _doc_char_concentration


def _priority_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_pyspark_etl_imdb_spark.operators.selection import (
        grouped_quantile_bands,
    )

    return grouped_quantile_bands(
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        "o_orderpriority",
        "o_totalprice",
    ).orderBy("o_orderpriority")


def _status_price_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_pyspark_etl_imdb_spark.operators.evalmetrics import (
        ks_two_sample_report,
    )

    return ks_two_sample_report(
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        "o_orderstatus",
        "o_totalprice",
        "O",
        "F",
    )


def _token_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_pyspark_etl_imdb_spark.operators.text import (
        gini_token_concentration,
    )

    return gini_token_concentration(_docs(spark, sf_dir))


QUERIES["priority_price_bands"] = _priority_price_bands
QUERIES["status_price_ks_test"] = _status_price_ks_test
QUERIES["token_gini_concentration"] = _token_gini_concentration


def _order_price_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_pyspark_etl_imdb_spark.operators.evalmetrics import (
        bootstrap_mean_ci,
    )

    return bootstrap_mean_ci(
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        "o_totalprice",
        "o_orderkey",
        n_replicates=128,
    )


def _dsir_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return importance.dsir_importance_sample(
        _docs(spark, sf_dir), F.col("lang") == "en", k=200
    ).orderBy("doc_id")


QUERIES["order_price_bootstrap_ci"] = _order_price_bootstrap_ci
QUERIES["dsir_importance_sample"] = _dsir_importance_sample


def _doclen_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_pyspark_etl_imdb_spark.operators.text import hill_tail_index

    return hill_tail_index(_docs(spark, sf_dir), "n_chars", k=100)


def _doc_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_pyspark_etl_imdb_spark.operators.text import readability_scores

    return readability_scores(_docs(spark, sf_dir)).orderBy("doc_id")


QUERIES["doclen_hill_tail"] = _doclen_hill_tail
QUERIES["doc_readability"] = _doc_readability


# --- experiment-health battery (r4, behind the window) ------------------
# SRM gate, post-hoc power/MDE, difference-in-differences, and the Murphy
# Brier decomposition — the readout-validity half of the experimentation
# family (extends abtest/evalmetrics; reference aggregate parity
# src/etl_imdb.py:214-260).
def _experiment_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_pyspark_etl_imdb_spark.operators import abtest

    return abtest.srm_check(_events(spark, sf_dir))


def _experiment_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_pyspark_etl_imdb_spark.operators import abtest

    return abtest.power_mde_report(_events(spark, sf_dir))


def _did_revenue_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_pyspark_etl_imdb_spark.operators import abtest

    return abtest.did_report(
        spark.read.parquet(f"{sf_dir}/orders.parquet")
    )


def _quality_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_pyspark_etl_imdb_spark.operators import evalmetrics
    from pipeline_pyspark_etl_imdb_spark.operators import text as text_ops

    return evalmetrics.brier_decomposition(
        _docs(spark, sf_dir).select(
            text_ops.quality_expr(F.col("text")).alias("quality"),
            (F.col("lang") == "en").alias("is_en"),
        ),
        "quality",
        "is_en",
        n_bins=10,
    )


QUERIES["experiment_srm_check"] = _experiment_srm_check
QUERIES["experiment_power_mde"] = _experiment_power_mde
QUERIES["did_revenue_estimate"] = _did_revenue_estimate
QUERIES["quality_brier_decomposition"] = _quality_brier_decomposition


# --- time-series diagnostics + warehouse reconciliation (r4) -------------
def _daily_revenue_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.daily_revenue_acf(spark, sf_dir, max_lag=14)


def _theilsen_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.theilsen_revenue_trend(spark, sf_dir)


def _order_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_pyspark_etl_imdb_spark.operators import warehouse

    return warehouse.reconciliation_audit(
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
    )


def _benford_price_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_pyspark_etl_imdb_spark.operators import warehouse

    return warehouse.benford_digit_audit(
        spark.read.parquet(f"{sf_dir}/orders.parquet"), "o_totalprice"
    )


QUERIES["daily_revenue_acf"] = _daily_revenue_acf
QUERIES["theilsen_revenue_trend"] = _theilsen_revenue_trend
QUERIES["order_total_reconciliation"] = _order_total_reconciliation
QUERIES["benford_price_digits"] = _benford_price_digits


# --- graph-structure diagnostics (r4, behind the window) -----------------
# Both run on the deterministic 1/4-node co-purchase subgraph (the
# copurchase_link_prediction convention) so the wedge-stream cost stays
# additive next to copurchase_triangles, which measures the full graph.
def _copurchase_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangles.local_clustering_coefficients(
        triangles.cooccurrence_edges(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
                F.col("l_partkey") % 4 == 0
            )
        ),
        top_n=100,
    )


def _copurchase_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangles.degree_assortativity(
        triangles.cooccurrence_edges(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
                F.col("l_partkey") % 4 == 0
            )
        )
    )


QUERIES["copurchase_clustering"] = _copurchase_clustering
QUERIES["copurchase_assortativity"] = _copurchase_assortativity


# --- corpus-analysis additions (r4, behind the window) -------------------
def _vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_ops.vocab_coverage_curve(_docs(spark, sf_dir))


def _en_distinctive_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return text_ops.distinctive_tokens_logodds(
        d, in_group=(F.col("lang") == "en"), top_k=20
    )


QUERIES["vocab_coverage_curve"] = _vocab_coverage_curve
QUERIES["en_distinctive_tokens"] = _en_distinctive_tokens


# --- behavior-dynamics + concentration + gains batch (r4, final) ---------
def _event_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_pyspark_etl_imdb_spark.operators import journeys

    return journeys.markov_entropy_rate(_events(spark, sf_dir))


def _user_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_pyspark_etl_imdb_spark.operators import journeys

    return journeys.user_burstiness(_events(spark, sf_dir))


def _parttype_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.parttype_supplier_hhi(spark, sf_dir)


def _quality_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_pyspark_etl_imdb_spark.operators import evalmetrics

    return evalmetrics.decile_lift_table(
        _docs(spark, sf_dir).select(
            "doc_id",
            text_ops.quality_expr(F.col("text")).alias("quality"),
            (F.col("lang") == "en").alias("is_en"),
        ),
        "quality",
        "is_en",
        "doc_id",
        n_tiles=10,
    )


def _doc_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_ops.compression_ratio(_docs(spark, sf_dir))


QUERIES["event_entropy_rate"] = _event_entropy_rate
QUERIES["user_burstiness"] = _user_burstiness
QUERIES["parttype_supplier_hhi"] = _parttype_supplier_hhi
QUERIES["quality_decile_lift"] = _quality_decile_lift
QUERIES["doc_compression_ratio"] = _doc_compression_ratio


# --- LPA communities (oracle-backed: the integer-only update rule makes
# the fixed-round result engine-exact — 5 unrolled rounds in SQL; also
# Python-replay pinned) ---
def _copurchase_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_pyspark_etl_imdb_spark.operators.components import (
        label_propagation,
    )

    return label_propagation(
        triangles.cooccurrence_edges(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
                F.col("l_partkey") % 4 == 0
            )
        ),
        n_iter=5,
    ).orderBy("node")


QUERIES["copurchase_communities"] = _copurchase_communities


def _copurchase_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS layers from the minimum part id over the co-purchase graph:
    hop distance to the nearest seed, integer-exact, 4 unrolled rounds
    in the oracle (the LPA discipline)."""
    from pipeline_pyspark_etl_imdb_spark.operators.components import bfs_hops

    return bfs_hops(
        triangles.cooccurrence_edges(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
                F.col("l_partkey") % 4 == 0
            )
        ),
        max_hops=4,
    ).orderBy("node")


QUERIES["copurchase_bfs_hops"] = _copurchase_bfs_hops


def _copurchase_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop WEIGHTED shortest distances from the minimum part id
    over the co-purchase graph — the weighted generalization of
    copurchase_bfs_hops (VERDICT r8 item #7: graph-path beyond plain
    hops). Edge weight = greatest(1, 5 - co_count): an integer "affinity
    distance" where frequently co-purchased pairs are closer, so optimal
    paths trade hop count against tie strength. dist = min path weight
    over <= 6 edges — a fixed-round Bellman-Ford quantity, integer-exact,
    6 unrolled relaxation rounds in the oracle (the BFS discipline)."""
    from pipeline_pyspark_etl_imdb_spark.operators.components import sssp_bounded

    ed = triangles.cooccurrence_weighted_edges(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
            F.col("l_partkey") % 4 == 0
        )
    ).select(
        "src",
        "dst",
        F.greatest(F.lit(1), F.lit(5) - F.col("co_count")).cast("long").alias("w"),
    )
    return sssp_bounded(ed, n_rounds=6).orderBy("node")


QUERIES["copurchase_sssp"] = _copurchase_sssp


def _copurchase_label_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-constrained reachability from the minimum part id: nodes
    within 4 hops spending AT MOST ONE weak edge (weak = the pair shares
    only one order; strong = co_count >= 2) — the property-path
    primitive (SPARQL/Cypher path-label class) as BFS over the product
    automaton states (node, weak-spent). (node, hops, weak_used) with
    the lexicographic (hops, weak) minimum per node; integer-exact, 4
    unrolled state rounds in the oracle (the BFS discipline)."""
    from pipeline_pyspark_etl_imdb_spark.operators.components import (
        bfs_label_budget,
    )

    ed = triangles.cooccurrence_weighted_edges(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
            F.col("l_partkey") % 4 == 0
        )
    ).select(
        "src", "dst", (F.col("co_count") < 2).cast("int").alias("is_weak")
    )
    return bfs_label_budget(ed, max_weak=1, max_hops=4).orderBy("node")


QUERIES["copurchase_label_reachability"] = _copurchase_label_reachability


def _quality_quantile_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quality calibration: each source's quality-score
    distribution mapped onto the POOLED distribution (midrank -> pooled
    interpolated quantile), so a global budget cut compares like with
    like across sources. Engine-exact double tree; the pooled order
    statistics come from the distributed total-order rank."""
    scored = _docs(spark, sf_dir).select(
        "doc_id", "source", text_ops.quality_expr(F.col("text")).alias("score")
    )
    return importance.quantile_normalize_scores(
        scored, "source", F.col("score"), "doc_id"
    )


QUERIES["quality_quantile_normalized"] = _quality_quantile_normalized


# --- r5 additions: nonparametric/multiple-testing inference, containment
# dedup, corpus-drift JSD, compaction planning (all oracle-backed; they
# head the R6 driver window above) ----------------------------------------

def _price_dec() -> F.Column:
    # column construction is deferred: F.col needs an active SparkContext
    return F.col("o_totalprice").cast("decimal(18,2)")


def _orders_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def _price_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-sum test: do open ('O') and fulfilled ('F') orders draw
    totals from the same distribution? Tie-corrected normal z over
    exact cent-priced midranks."""
    return inference.mannwhitney_u_report(
        _orders_frame(spark, sf_dir), _price_dec(), F.col("o_orderstatus"), "O", "F"
    )


def _event_value_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz randomness check of each event type's value
    sequence around its mean (exact decimal above/below split)."""
    events = _events(spark, sf_dir)
    base = events.select(
        "event_type",
        "event_id",
        F.col("value").cast("decimal(18,4)").alias("v_dec"),
        eventtime.ts_micros(events).alias("us"),
    )
    return inference.runs_test_report(
        base, "event_type", F.col("v_dec"), ["us", "event_id"]
    )


def _priority_price_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of order totals across the five priorities."""
    return inference.anova_report(
        _orders_frame(spark, sf_dir), "o_orderpriority", _price_dec()
    )


def _price_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-deterministic randomization test: urgent vs non-urgent mean
    order total, 200 md5-seeded reassignment replicates."""
    return inference.permutation_mean_test(
        _orders_frame(spark, sf_dir),
        F.col("o_orderkey"),
        _price_dec(),
        F.col("o_orderpriority") == "1-URGENT",
        n_replicates=200,
        salt="perm1",
    )


def _event_value_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Welch z battery vs the complement with
    Benjamini-Hochberg FDR control at alpha=0.05."""
    events = _events(spark, sf_dir)
    return inference.bh_fdr_report(
        events, "event_type", F.col("value").cast("decimal(18,4)"), alpha=0.05
    )


def _segment_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of account balance vs total spend per
    market segment (midranks, Pearson over ranks)."""
    orders = _orders_frame(spark, sf_dir)
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(_price_dec()).cast("decimal(18,2)").alias("spend")
    )
    joined = customer.join(
        spend, customer["c_custkey"] == spend["o_custkey"]
    ).select(
        "c_mktsegment",
        F.col("c_acctbal").cast("decimal(12,2)").alias("bal"),
        "spend",
    )
    return inference.grouped_spearman(
        joined, "c_mktsegment", F.col("bal"), F.col("spend")
    )


def _customer_bivariate_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mahalanobis outliers in the (account balance, total spend) plane —
    chi^2_2 0.999 cut, closed-form 2x2 inverse, bit-deterministic from
    exact decimal moments."""
    orders = _orders_frame(spark, sf_dir)
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(_price_dec()).cast("decimal(18,2)").alias("spend")
    )
    joined = customer.join(
        spend, customer["c_custkey"] == spend["o_custkey"]
    ).select(
        "c_custkey",
        F.col("c_acctbal").cast("decimal(12,2)").alias("bal"),
        "spend",
    )
    return inference.bivariate_outlier_report(
        joined, "c_custkey", F.col("bal"), F.col("spend")
    )


def _doc_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-containment dedup: docs fully swallowed by another doc
    (rarest-interior-shingle candidates, exact instr verify)."""
    return neardup.containment_pairs(_docs(spark, sf_dir))


def _split_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split near-dup leakage: Jaccard >= 0.8 pairs whose endpoints
    landed in different train/val/test splits — the eval-integrity check
    id-level splitting cannot give (r6 addition, queued for r7)."""
    return corpus.split_leakage_report(_docs(spark, sf_dir))


def _dedup_cascade_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-ordered dedup survivorship — exact -> contained -> near —
    with per-document attribution (keep, stage, canonical_id); the
    composite an actual pipeline runs (r6 addition, queued for r7)."""
    return neardup.dedup_cascade(_docs(spark, sf_dir))


def _containment_df_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-budget observability for the complete containment form:
    rarest-interior-shingle df distribution (exact fan-out, skew ceiling,
    docs a 1%/10% df_frac_cap would exclude) — ADVICE r5."""
    return neardup.containment_df_profile(_docs(spark, sf_dir))


def _source_token_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between source unigram
    distributions — the corpus-drift distance before mixing."""
    return text_ops.source_token_jsd(_docs(spark, sf_dir))


# deterministic synthetic file listing for the compaction planner: group
# every 20 consecutive doc_ids per source into one "file" whose size is
# the exact byte total of its docs
_COMPACTION_TARGET_BYTES = 16384


def _doc_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    files = (
        _docs(spark, sf_dir)
        .groupBy(
            F.col("source"),
            F.expr("doc_id div 20").cast("bigint").alias("file_id"),
        )
        .agg(F.sum(F.octet_length("text")).cast("bigint").alias("size_bytes"))
    )
    return corpus.compaction_plan(
        files, "source", "file_id", "size_bytes", _COMPACTION_TARGET_BYTES
    )


QUERIES["price_mannwhitney_u"] = _price_mannwhitney_u
QUERIES["event_value_runs_test"] = _event_value_runs_test
QUERIES["priority_price_anova"] = _priority_price_anova
QUERIES["price_permutation_test"] = _price_permutation_test
QUERIES["event_value_bh_fdr"] = _event_value_bh_fdr
QUERIES["segment_spearman"] = _segment_spearman
QUERIES["customer_bivariate_outliers"] = _customer_bivariate_outliers
QUERIES["doc_containment_pairs"] = _doc_containment_pairs
QUERIES["containment_df_profile"] = _containment_df_profile
QUERIES["dedup_cascade_report"] = _dedup_cascade_report
QUERIES["split_leakage_report"] = _split_leakage_report
QUERIES["source_token_jsd"] = _source_token_jsd
QUERIES["doc_compaction_plan"] = _doc_compaction_plan


def _weak_label_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snorkel-style labeling-function diagnostics over the document
    corpus: per-LF coverage / overlap / conflict / consensus agreement
    for five deterministic quality heuristics, plus the majority-vote
    consensus machinery a learned filter trains on (r6 addition,
    slotted in the r6 window). Engine-exact votes — integer comparisons
    or identical double trees — so the report hash-matches the oracle
    with no margin analysis (operators/weaklabel.py)."""
    return weaklabel.weak_label_report(_docs(spark, sf_dir))


QUERIES["weak_label_report"] = _weak_label_report


# --- apply the R9 driver-window reorder (see _R9_WINDOW above) -----------
assert len(_R9_WINDOW) == 50, len(_R9_WINDOW)
assert len(set(_R9_WINDOW)) == len(_R9_WINDOW)
assert all(name in QUERIES for name in _R9_WINDOW), sorted(
    set(_R9_WINDOW) - set(QUERIES)
)
QUERIES = {name: QUERIES[name] for name in _R9_WINDOW} | {
    name: fn for name, fn in QUERIES.items() if name not in set(_R9_WINDOW)
}
