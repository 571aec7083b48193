"""Analytics query surface over the driver's synthetic warehouse.

Each function here is one declared capability from SURVEY.md §2.11,
re-expressed on the TPC-H-ish fixture tables (TESTDATA.md) so the driver
can hash-match it against a DuckDB oracle. The shapes map 1:1 onto the
reference pipeline's operators:

  pricing_summary          — filter + groupBy multi-agg + sort (A1/O1, TPC-H Q1 shape)
  year_order_kpi           — per-year count/avg/sum (mart_year_kpi shape, reference :196-205)
  top_orders_per_segment_year — per-group top-K via ranking window (reference :214-222)
  order_price_histogram    — fixed-width bucketing + 2-col group count (reference :230-235)
  distinct_segments        — full-row distinct (reference :153/:179)
  part_type_words          — split/explode/trim/lower + distinct (reference :168-179)
  part_word_bridge         — distinct (key, token) pairs, the N:N bridge (reference :180-182)
  region_revenue           — multi-table inner equi-join star (reference :186/:209)
  dedup_lineitem_latest    — deterministic dedup-by-key (reference :139 dropDuplicates, made reproducible)
  null_marker_cast         — sentinel->NULL + null-on-error cast (reference :125-126, :135-137, :172)

Numeric policy for oracle stability: money aggregations accumulate in
DECIMAL (exact, order-independent) and only the final result casts to
double; averages are computed as decimal-sum / count. Float SUMs would
differ between engines in the last ulps depending on partition/accumulation
order — decimals can't.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.functions.cleaning import null_if_equal, to_int, width_bucket
from pipeline_pyspark_etl_imdb_spark.operators.dedup import dedup_by_key_deterministic, dedup_exact_rows
from pipeline_pyspark_etl_imdb_spark.operators.topk import top_k_per_group


def _dec(col: str | Column, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS): unreadable on a bare
        # session (the driver's) without this runtime-settable legacy conf
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with map-side partials.

    Filter sits directly on the parquet scan (pushed down), grouping keys
    are low-cardinality so AQE coalesces the shuffle to a handful of
    partitions.
    """
    li = _table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (1 - _dec("l_discount", 4))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def year_order_kpi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-year order count / mean price / total price (mart_year_kpi shape)."""
    orders = _table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(_dec("o_totalprice")).cast("double") / F.count("*")).alias("mean_price"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        )
        .orderBy("order_year")
    )


def top_orders_per_segment_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 orders per (market segment, year) by price — ranking window
    with deterministic o_orderkey tie-break; group-limit optimized."""
    orders = _table(spark, sf_dir, "orders")
    customer = _table(spark, sf_dir, "customer")
    joined = orders.join(customer, orders.o_custkey == customer.c_custkey, "inner").select(
        "c_mktsegment",
        F.year("o_orderdate").cast("int").alias("order_year"),
        "o_orderkey",
        "o_totalprice",
    )
    ranked = top_k_per_group(
        joined,
        ["c_mktsegment", "order_year"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        10,
    )
    return ranked.select("c_mktsegment", "order_year", "o_orderkey", "o_totalprice", "rk")


def order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of order prices in 1000-wide buckets per order status."""
    orders = _table(spark, sf_dir, "orders")
    return (
        orders.withColumn("price_bucket", width_bucket("o_totalprice", 1000.0).cast("double"))
        .groupBy("o_orderstatus", "price_bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderstatus", "price_bucket")
    )


def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-row distinct on a projection (dim_year shape)."""
    return dedup_exact_rows(
        _table(spark, sf_dir, "customer").select("c_mktsegment")
    ).orderBy("c_mktsegment")


def part_type_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-value string -> normalized token dimension (dim_genre shape):
    split p_type on spaces, explode, trim+lower, distinct."""
    part = _table(spark, sf_dir, "part")
    words = part.select(
        F.explode(F.split(F.col("p_type"), " ")).alias("raw_word")
    ).select(F.trim(F.lower(F.col("raw_word"))).alias("word"))
    return dedup_exact_rows(words.where(F.col("word") != "")).orderBy("word")


def part_word_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (p_partkey, word) pairs — the N:N bridge-table shape."""
    part = _table(spark, sf_dir, "part")
    pairs = part.select(
        "p_partkey", F.explode(F.split(F.col("p_type"), " ")).alias("raw_word")
    ).select("p_partkey", F.trim(F.lower(F.col("raw_word"))).alias("word"))
    return dedup_exact_rows(pairs.where(F.col("word") != ""))


def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region, revenue
    per region. Dim tables are broadcast (they are tiny at every SF; at
    100 TB the fact side streams through unchanged)."""
    li = _table(spark, sf_dir, "lineitem")
    orders = _table(spark, sf_dir, "orders")
    customer = _table(spark, sf_dir, "customer")
    nation = _table(spark, sf_dir, "nation")
    region = _table(spark, sf_dir, "region")
    revenue = _dec("l_extendedprice") * (1 - _dec("l_discount", 4))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey, "inner")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "inner")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "inner")
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
        .orderBy("region_name")
    )


def dedup_lineitem_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dedup-by-key: per order keep the lineitem that ships
    last (ties -> lowest line number). Reproducible version of the
    reference's dropDuplicates(["tconst"])."""
    li = _table(spark, sf_dir, "lineitem")
    survivors = dedup_by_key_deterministic(
        li.select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"),
        ["l_orderkey"],
        [F.desc("l_shipdate"), F.asc("l_linenumber"), F.asc("l_quantity")],
    )
    return survivors.select("l_orderkey", "l_linenumber", "l_quantity")


def null_marker_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentinel->NULL + null-on-error cast over string data.

    Exercises the reference's cleaning contract on fixture data: the 'P'
    order status is treated as a sentinel and nulled out (CASE WHEN form,
    reference :172); the priority code before the '-' casts to int; a
    non-numeric string casts to NULL rather than erroring (reference
    :135-137 semantics, ANSI-safe via try_cast).
    """
    orders = _table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            null_if_equal("o_orderstatus", "P").alias("status_or_null"),
            to_int(F.split(F.col("o_orderpriority"), "-").getItem(0)).alias("priority_num"),
            to_int(F.lit("not-a-number")).alias("always_null"),
        )
        .where(F.col("o_orderkey") <= 1000)
    )


def lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation: subtotals per (returnflag, linestatus), per
    returnflag, and grand total (grouping-sets surface the reference lacks)."""
    li = _table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def orders_with_lineitems_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): orders having at least one lineitem,
    counted per order status."""
    orders = _table(spark, sf_dir, "orders")
    li = _table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderstatus")
    )


def customers_without_orders_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no orders, per segment."""
    customer = _table(spark, sf_dir, "customer")
    orders = _table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


def return_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: share of revenue from returned lineitems
    per order year (sum(CASE WHEN)/sum shape; exact decimal accumulation,
    one final double division)."""
    li = _table(spark, sf_dir, "lineitem")
    orders = _table(spark, sf_dir, "orders")
    revenue = _dec("l_extendedprice") * (1 - _dec("l_discount", 4))
    returned = F.when(F.col("l_returnflag") == "R", revenue).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            (
                F.sum(returned).cast("double") / F.sum(revenue).cast("double")
            ).alias("return_share"),
            F.sum(revenue).cast("double").alias("total_revenue"),
        )
        .orderBy("order_year")
    )


def purchase_last_click_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): each purchase event enriched with the
    user's most recent click at or before it. Right side deduped to one
    click per (user, instant) first so the match is deterministic."""
    from pipeline_pyspark_etl_imdb_spark.operators.asof import asof_join
    from pipeline_pyspark_etl_imdb_spark.operators.eventtime import ts_micros

    events = _table(spark, sf_dir, "events")
    base = events.select("event_id", "user_id", "event_type", ts_micros(events).alias("us"))
    purchases = base.where(F.col("event_type") == "purchase").select(
        "user_id", "us", F.col("event_id").alias("purchase_id")
    )
    clicks = (
        base.where(F.col("event_type") == "click")
        .groupBy("user_id", "us")
        .agg(F.max("event_id").alias("click_id"))
    )
    return asof_join(
        purchases, clicks, on="us", by="user_id", value_cols=["click_id"],
        right_on_alias="click_us",
    ).select("user_id", "purchase_id", "us", "click_id", "click_us")


def revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window (lag): yearly revenue and absolute year-over-year
    delta. Exact decimal totals; the delta is a decimal difference cast to
    double at the end."""
    orders = _table(spark, sf_dir, "orders")
    yearly = orders.groupBy(
        F.year("o_orderdate").cast("int").alias("order_year")
    ).agg(F.sum(_dec("o_totalprice")).alias("rev"))
    w = Window.orderBy("order_year")
    return yearly.select(
        "order_year",
        F.col("rev").cast("double").alias("revenue"),
        (F.col("rev") - F.lag("rev").over(w)).cast("double").alias("yoy_delta"),
    ).orderBy("order_year")


def customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-over-frame window: per customer, the running total of
    order value in (date, key) order — rowsBetween unbounded-preceding.
    Deterministic via the orderkey tie-break; exact decimal accumulation."""
    orders = _table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


def segment_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantiles per group: median and p90 of order value by customer
    segment (percentile with linear interpolation — not approx)."""
    orders = _table(spark, sf_dir, "orders")
    customer = _table(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.median("o_totalprice").alias("median_price"),
            F.percentile("o_totalprice", 0.9).alias("p90_price"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


def order_status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: counts for every combination of (status,
    priority), each margin, and the grand total."""
    orders = _table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderstatus", "o_orderpriority")
    )


def customer_order_profile_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with null-repair: every customer, order count and
    total spend, customers without orders kept at 0 via coalesce."""
    customer = _table(spark, sf_dir, "customer")
    orders = _table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n"), F.sum(_dec("o_totalprice")).alias("spend")
    )
    return customer.join(
        per_cust, customer.c_custkey == per_cust.o_custkey, "left"
    ).select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_orders"),
        F.coalesce(F.col("spend").cast("double"), F.lit(0.0)).alias("total_spend"),
    )


def nation_role_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators in one query: nations appearing as BOTH supplier and
    customer homes (INTERSECT), and as supplier-only (EXCEPT), tagged and
    UNIONed."""
    supplier = _table(spark, sf_dir, "supplier")
    customer = _table(spark, sf_dir, "customer")
    s_nations = supplier.select(F.col("s_nationkey").alias("nationkey")).distinct()
    c_nations = customer.select(F.col("c_nationkey").alias("nationkey")).distinct()
    both = s_nations.intersect(c_nations).select(
        "nationkey", F.lit("both").alias("role")
    )
    supplier_only = s_nations.exceptAll(c_nations).select(
        "nationkey", F.lit("supplier_only").alias("role")
    )
    return both.union(supplier_only).orderBy("nationkey")


def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight multi-predicate filter + single global
    aggregate. Every predicate pushes to the parquet scan; the aggregate
    is a one-row map-side-combined reduction — the cheapest possible plan
    for a 100 TB 'what if' sweep."""
    li = _table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount", 4))
            .cast("double")
            .alias("revenue_change"),
            F.count("*").alias("n_items"),
        )
    )


def customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank family: ntile / percent_rank / cume_dist over
    each customer's total spend — computed DISTRIBUTEDLY by
    operators/ranks.total_order_ranks (range shuffle + partitioned local
    ranks + broadcast partition offsets), never a single-partition
    global window. The ordering (spend, custkey) is a total order, so
    the result matches the SQL window functions exactly."""
    from pipeline_pyspark_etl_imdb_spark.operators.ranks import total_order_ranks

    orders = _table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(_dec("o_totalprice")).alias("spend_dec")
    )
    ranked = total_order_ranks(spend, ["spend_dec", "o_custkey"], ntile=10)
    return ranked.select(
        "o_custkey",
        F.col("spend_dec").cast("double").alias("total_spend"),
        F.col("bucket").alias("decile"),
        "pct_rank",
        "cume",
    )


def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap fill: hourly event counts per
    event_type with ZERO rows for hours where a type had no events —
    the densify step before any rolling-window model sees the series.

    The hour spine is generated distributively (sequence + explode of
    the global [min,max] hour range — a single-row aggregate, broadcast
    to the distinct-type frame), then left-joined against the observed
    counts. No driver-side loop; the spine size is (hours x types),
    independent of event volume."""
    from pipeline_pyspark_etl_imdb_spark.operators.eventtime import ts_micros

    events = _table(spark, sf_dir, "events")
    with_hour = events.select(
        "event_type", (F.floor(ts_micros(events) / 3_600_000_000)).alias("hour")
    )
    counts = with_hour.groupBy("event_type", "hour").agg(F.count("*").alias("n"))
    span = with_hour.agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    hours = span.select(F.explode(F.sequence("h0", "h1")).alias("hour"))
    types = with_hour.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(hours))
    return (
        spine.join(counts, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce(F.col("n"), F.lit(0).cast("bigint")).alias("n"),
        )
    )


def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust statistics: per return flag, winsorize extended price at the
    exact p05/p95 (linear-interpolation percentile, the (n-1)*p
    definition both Spark's `percentile` and ANSI percentile_cont use),
    then average the clipped values — the outlier-robust KPI pattern.

    Shape: one grouped exact-percentile aggregate (the group count is
    tiny, 3 flags), broadcast back onto the fact scan, then a second
    grouped aggregate. The fact table shuffles on the same low-cardinality
    key twice; at scale the percentile pass is the costly one (exact
    percentile buffers per-group values) — swap in percentile_approx
    there when estimates are acceptable."""
    li = _table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").cast("double").alias("price")
    )
    pcts = li.groupBy("l_returnflag").agg(
        F.percentile("price", 0.05).alias("p05"),
        F.percentile("price", 0.95).alias("p95"),
    )
    clipped = li.join(F.broadcast(pcts), "l_returnflag").withColumn(
        "clipped", F.least(F.greatest(F.col("price"), F.col("p05")), F.col("p95"))
    )
    return (
        clipped.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.min("p05").alias("p05"),
            F.min("p95").alias("p95"),
            F.avg("clipped").alias("avg_winsorized"),
        )
        .orderBy("l_returnflag")
    )


def order_gap_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation-window function family (lag/lead/first/last/nth) over
    each customer's order history: days since the previous order, days to
    the next, and the customer's first/second/latest order price alongside
    every order. One shuffle on the customer key serves all five window
    functions (same partitioning + ordering -> one Window operator)."""
    orders = _table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias(
            "days_since_prev"
        ),
        F.datediff(F.lead("o_orderdate").over(w), F.col("o_orderdate")).alias(
            "days_to_next"
        ),
        F.first("o_totalprice").over(w_full).alias("first_price"),
        F.nth_value("o_totalprice", 2).over(w_full).alias("second_price"),
        F.last("o_totalprice").over(w_full).alias("latest_price"),
    )


def order_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the general form behind cube/rollup (which the
    cube/rollup queries already exercise): three explicit aggregation
    grains in ONE pass over orders — (status, priority), (status), and
    grand total — with per-column grouping flags disambiguating real
    NULLs from subtotal rows. Catalyst plans this as a single Expand +
    partial aggregate: one scan, one shuffle, regardless of how many
    sets are declared."""
    from pipeline_pyspark_etl_imdb_spark.sources.tables import load_tables

    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus,
               o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
        """
    )


def orders_above_global_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders priced above the global average, with the
    average and the ratio alongside. Catalyst evaluates the uncorrelated
    subquery once (a one-row broadcast reused by every comparison) — at
    100 TB the fact table streams map-side against that single value; no
    join, no shuffle beyond the aggregate that computes the scalar.
    The mean is written as exact-DECIMAL sum / count with ONE final
    double division (engines disagree on avg(DECIMAL) result types, so
    avg() itself is not portable at the last ulp)."""
    from pipeline_pyspark_etl_imdb_spark.sources.tables import load_tables

    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        WITH g AS (
            SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*) AS avg_price
            FROM orders
        )
        SELECT o_orderkey,
               o_custkey,
               o_totalprice,
               (SELECT avg_price FROM g) AS global_avg_price,
               o_totalprice / (SELECT avg_price FROM g) AS price_ratio
        FROM orders
        WHERE o_totalprice > (SELECT avg_price FROM g)
        """
    )


def segment_price_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment OLS trend of order price over order year: slope,
    intercept, and r² from the closed-form sums — grouped linear
    regression as ONE partial-aggregated groupBy (n, Σx, Σy, Σxy, Σx²,
    Σy² collapse map-side; nothing but 6 numbers per segment crosses the
    wire). At 100 TB this is the shape for per-cohort trend fitting —
    never a per-group collect or an iterative solver.

    Numeric policy: x is an int year and y accumulates in DECIMAL, so
    every sum is EXACT and order-independent; the slope/intercept/r²
    divisions happen once on the exact sums cast to double — the same
    IEEE operations in any engine, hash-matching the oracle."""
    orders = _table(spark, sf_dir, "orders")
    customer = _table(spark, sf_dir, "customer")
    j = orders.join(
        customer, orders.o_custkey == customer.c_custkey, "inner"
    ).select(
        "c_mktsegment",
        F.year("o_orderdate").cast("long").alias("x"),
        _dec("o_totalprice").alias("y"),
    )
    agg = j.groupBy("c_mktsegment").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("x")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    slope = cov / varx
    return agg.select(
        "c_mktsegment",
        F.col("n").alias("n_orders"),
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
        ((cov * cov) / (varx * vary)).alias("r2"),
    ).orderBy("c_mktsegment")


def revenue_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of daily revenue — trend +
    day-of-week seasonal + residual (the STL-lite recipe behind
    seasonal-adjusted anomaly detection: a Monday dip is not an anomaly
    if Mondays always dip; `event_dow_seasonality` reports the indexes,
    this subtracts them):

      trend_t    = centered 7-day moving average (edge days average the
                   rows available in frame — both engines' AVG-over-frame
                   semantics);
      seasonal_d = mean detrended value of the day's weekday, re-centered
                   to zero DAY-WEIGHTED mean (weekday effects weighted by
                   their day counts — so the level stays in trend and the
                   identity below is exact even on partial weeks);
      residual   = total − trend − seasonal, the anomaly signal.

    Shape: one day-granular aggregate (calendar-sized, DECIMAL-exact),
    then ROWS-frame and weekday windows over that SMALL frame — the
    partition-less windows see days, not orders. The decomposition
    identity total == trend + seasonal + residual holds exactly by
    construction and is oracle-checked."""
    orders = _table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum(_dec("o_totalprice")).alias("__t"))
        .select("day", F.col("__t").cast("double").alias("total"))
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    with_trend = daily.withColumn("trend", F.avg("total").over(w7))
    wd = Window.partitionBy(F.dayofweek("day"))
    with_season = with_trend.withColumn(
        "__s_raw", F.avg(F.col("total") - F.col("trend")).over(wd)
    )
    # re-center so the 7 weekday effects sum to zero (level stays in trend)
    wall = Window.partitionBy()
    centered = with_season.withColumn(
        "seasonal",
        F.col("__s_raw")
        - F.mean(F.col("__s_raw")).over(wall),
    )
    return centered.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "total",
        "trend",
        "seasonal",
        (F.col("total") - F.col("trend") - F.col("seasonal")).alias("residual"),
    ).orderBy("day")


def customer_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per ordering customer, quintile scores for
    Recency (days since last order, 5 = most recent), Frequency (order
    count, 5 = most), Monetary (DECIMAL-exact spend, 5 = highest), plus
    the concatenated 'rfm' segment label — the classic
    marketing-selection operator, and a showcase of the distributed-rank
    primitive: THREE total orders over the customer-domain frame, each a
    ranks.total_order_ranks range shuffle (no single-partition window,
    no data-sized Exchange — the frame is customer-sized, not
    order-sized). Ties are broken by custkey, so every ntile matches SQL
    NTILE(5) OVER (ORDER BY metric, custkey) bit-for-bit; the monetary
    rank orders on the exact DECIMAL, never a rounded double."""
    from pipeline_pyspark_etl_imdb_spark.operators.ranks import total_order_ranks

    orders = _table(spark, sf_dir, "orders")
    # NULL custkeys are excluded: Spark sorts NULLS FIRST ascending,
    # DuckDB NULLS LAST, so a null key would shift every ntile boundary
    per_cust = (
        orders.where(F.col("o_custkey").isNotNull())
        .groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("__last"),
            F.count("*").alias("frequency"),
            F.sum(_dec("o_totalprice")).alias("__spend"),
        )
    )
    mx = per_cust.agg(F.max("__last").alias("__mx"))
    base = per_cust.crossJoin(F.broadcast(mx)).select(
        "o_custkey",
        F.datediff(F.col("__mx"), F.col("__last")).cast("bigint").alias(
            "recency_days"
        ),
        "frequency",
        "__spend",
    )
    # Materialize ONLY rank-1's input (r10): the checkpoint pins the
    # orders aggregate once, so the expensive subtree never re-executes;
    # ranks 2 and 3 chain over customer-sized in-memory frames whose
    # range-sampling passes reuse the previous rank's shuffle outputs at
    # the RDD level (map outputs are written once per stage), so the
    # extra passes are reads of customer-sized shuffle files, not
    # recomputes. r9 checkpointed all three rank inputs, which cost two
    # more eager checkpoint jobs per call and made the driver's 32-core
    # number WORSE (2.00 -> 3.80 s: dispatch, not data); one checkpoint
    # keeps the r9 structural win (no repeated orders aggregate) at a
    # third of the materialization latency.
    r = total_order_ranks(
        base, ["recency_days", "o_custkey"], ntile=5, materialize_input=True
    ).select(
        "o_custkey",
        "recency_days",
        "frequency",
        "__spend",
        (6 - F.col("bucket")).alias("r_score"),
    )
    f = total_order_ranks(
        r, ["frequency", "o_custkey"], ntile=5
    ).select(
        "o_custkey",
        "recency_days",
        "frequency",
        "__spend",
        "r_score",
        F.col("bucket").alias("f_score"),
    )
    m = total_order_ranks(
        f, ["__spend", "o_custkey"], ntile=5
    ).select(
        "o_custkey",
        "recency_days",
        "frequency",
        "r_score",
        "f_score",
        F.col("bucket").alias("m_score"),
    )
    return m.withColumn(
        "rfm",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    ).orderBy("o_custkey")


def daily_revenue_acf(
    spark: SparkSession, sf_dir: str, max_lag: int = 14
) -> DataFrame:
    """Sample autocorrelation of daily revenue at lags 1..max_lag — the
    standard diagnostic behind seasonality detection (a spike at lag 7
    confirms the weekly cycle `revenue_seasonal_decomposition` removes)
    and residual whiteness checks:

        r_k = sum_{t>k} (y_t - ybar)(y_{t-k} - ybar) / sum_t (y_t - ybar)^2

    with the GLOBAL mean in both numerator and denominator (the
    textbook biased estimator — deterministic, no per-lag re-centering).

    Shape: one day-granular DECIMAL aggregate (calendar-sized), one
    ordered window producing all max_lag lag columns in a single pass,
    then ONE constant-size fold emitting (lag, n_pairs, acf) rows via
    explode — the partition-less window sees days, not orders."""
    orders = _table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(_dec("o_totalprice")).alias("__t"))
        .select("day", F.col("__t").cast("double").alias("y"))
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w = Window.orderBy("day")
    d = daily.withColumn("ybar", F.avg("y").over(wall))
    for k in range(1, max_lag + 1):
        d = d.withColumn(f"__l{k}", F.lag("y", k).over(w))
    dev = F.col("y") - F.col("ybar")
    aggs = [
        F.count("*").cast("bigint").alias("n_days"),
        F.sum(dev * dev).alias("ss"),
    ]
    for k in range(1, max_lag + 1):
        lk = F.col(f"__l{k}")
        aggs.append(
            F.sum(F.when(lk.isNotNull(), dev * (lk - F.col("ybar")))).alias(
                f"__num{k}"
            )
        )
        aggs.append(
            F.sum(F.when(lk.isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"__n{k}")
        )
    one = d.agg(*aggs)
    rows = [
        F.struct(
            F.lit(k).alias("lag"),
            F.col(f"__n{k}").alias("n_pairs"),
            (F.col(f"__num{k}") / F.col("ss")).alias("acf"),
        )
        for k in range(1, max_lag + 1)
    ]
    return (
        one.select("n_days", F.explode(F.array(*rows)).alias("m"))
        .select("n_days", "m.*")
        .orderBy("lag")
    )


def theilsen_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily revenue: the median of all
    pairwise slopes (y_j - y_i) / (x_j - x_i) over day pairs i < j, with
    the intercept as the median of y_i - slope * x_i — the
    breakdown-resistant alternative to the OLS `segment_price_trend`
    (one outlier day cannot move it). x is the integer day offset from
    the first observed day; medians use continuous interpolation (the
    percentile == quantile_cont parity contract of time_to_convert).

    Shape: the day frame is CALENDAR-sized, so the pair frame is
    calendar² — bounded by observation span, independent of row count
    (2400 days -> ~2.9M pairs); the join broadcasts the day frame. At
    100 TB the daily aggregate is the only data-sized pass."""
    orders = _table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(_dec("o_totalprice")).alias("__t"))
        .select("day", F.col("__t").cast("double").alias("y"))
    )
    lo = daily.agg(F.min("day").alias("__lo"))
    d = daily.crossJoin(F.broadcast(lo)).select(
        F.datediff(F.col("day"), F.col("__lo")).cast("long").alias("x"), "y"
    )
    # the day frame is an agg output (AQE-coalesced to ~1 partition); the
    # pair join multiplies its work by n_days, so spread the STREAM side
    # across cores first — the shuffle moves only the calendar-sized
    # frame. Keyed (hash) repartition, NOT round-robin: every evaluation
    # of this subtree must produce identical partition contents, because
    # the rank selection below re-evaluates it (see the reuse note there).
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    a = d.select(F.col("x").alias("xa"), F.col("y").alias("ya")).repartition(
        shuffle_n, "xa"
    )
    b = d.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    pairs = a.join(F.broadcast(b), F.col("xa") < F.col("xb")).select(
        (
            (F.col("yb") - F.col("ya"))
            / (F.col("xb") - F.col("xa")).cast("double")
        ).alias("slope")
    )
    # slope median via the DISTRIBUTED total-order rank, not the exact
    # `percentile` aggregate: percentile buffers a value->count hash map
    # of the whole pair multiset on the final reducer (measured 22 s on
    # 2.9M slopes at sf0.1); rank selection range-shuffles once and the
    # driver holds one integer (the pair count — the narrowing-contract
    # state shape). Median = mean of the two middle order statistics
    # ((m+1)//2 and m//2+1 coincide for odd m), identical to
    # quantile_cont at 0.5.
    #
    # Materialize the pair frame ONCE (r9): without it the generator runs
    # three times — the count below, repartitionByRange's boundary
    # sampling, and the range shuffle itself. localCheckpoint (unlike
    # persist) is SAFE in front of total_order_ranks — its LogicalRDD is
    # a pinned materialization, not an InMemoryRelation, so the AQE
    # range-exchange reuse the offsets join depends on is unaffected
    # (total_order_ranks itself checkpoints cached inputs for exactly
    # this reason). The frame is calendar²-bounded (~2.9M rows at
    # sf0.1), so the checkpoint is cheap at any data scale; blocks are
    # freed at the harness's next release_tracked().
    from pipeline_pyspark_etl_imdb_spark.operators.ranks import total_order_ranks
    from pipeline_pyspark_etl_imdb_spark.operators.util import eager_checkpoint

    pairs = eager_checkpoint(pairs)
    m = pairs.count()
    r1, r2 = (m + 1) // 2, m // 2 + 1
    med = (
        total_order_ranks(pairs, ["slope"])
        .where(F.col("global_rn").isin(r1, r2))
        .agg(F.avg("slope").alias("slope_per_day"))
        .select(F.lit(m).cast("bigint").alias("n_pairs"), "slope_per_day")
    )
    resid = d.crossJoin(F.broadcast(med)).select(
        "n_pairs",
        "slope_per_day",
        (F.col("y") - F.col("slope_per_day") * F.col("x").cast("double")).alias(
            "__r"
        ),
    )
    return resid.groupBy("n_pairs", "slope_per_day").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.expr("percentile(__r, 0.5)").alias("intercept"),
    ).select("n_days", "n_pairs", "slope_per_day", "intercept")


def parttype_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of supplier revenue within
    each part type — HHI = sum_s share_s^2 (1/n = perfectly split, 1.0 =
    single-supplier) — the supply-risk screen: a type whose revenue
    concentrates in one supplier is a procurement single point of
    failure. Since HHI = sum(rev^2) / (sum rev)^2, one partial-agg
    groupBy per level suffices; revenue stays DECIMAL through both
    aggregations (order-independent), and only the final ratio divides
    as double. Output per type: n_suppliers, total revenue, hhi,
    effective_suppliers (1/hhi), ordered by hhi desc."""
    li = _table(spark, sf_dir, "lineitem")
    part = _table(spark, sf_dir, "part")
    rev = (
        li.join(part.select("p_partkey", "p_type"), li.l_partkey == part.p_partkey)
        .groupBy("p_type", "l_suppkey")
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (
                        F.lit(1).cast("decimal(4,2)")
                        - F.col("l_discount").cast("decimal(4,2)")
                    )
                )
            ).alias("rev")
        )
    )
    out = rev.groupBy("p_type").agg(
        F.count("*").cast("bigint").alias("n_suppliers"),
        F.sum("rev").alias("__tot"),
        F.sum(F.col("rev") * F.col("rev")).alias("__ssq"),
    )
    tot = F.col("__tot").cast("double")
    hhi = F.col("__ssq").cast("double") / (tot * tot)
    return out.select(
        "p_type",
        "n_suppliers",
        tot.alias("total_revenue"),
        hhi.alias("hhi"),
        (F.lit(1.0) / hhi).alias("effective_suppliers"),
    ).orderBy(F.desc("hhi"), F.asc("p_type"))
