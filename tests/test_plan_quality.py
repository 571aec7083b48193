"""Physical-plan regression gate: the headline queries must keep the plans
they were tuned to — broadcast dims, pushed filters, group-limit top-K,
whole-stage codegen. A correctness-preserving change that silently turns a
broadcast star join into shuffles should fail here, not at 100 TB."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.plans import analytics
from tests.conftest import SF_ORACLE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_region_revenue_broadcasts_all_dims(spark):
    plan = _plan(analytics.region_revenue(spark, SF_ORACLE))
    assert plan.count("BroadcastHashJoin") == 4
    assert "SortMergeJoin" not in plan


def test_pricing_summary_pushes_filter_and_prunes(spark):
    plan = _formatted(analytics.pricing_summary(spark, SF_ORACLE))
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate reached the scan
    read_schema = plan.split("ReadSchema:")[-1].split("\n")[0]
    assert "l_partkey" not in read_schema  # untouched columns pruned
    assert "l_shipdate" in read_schema


def test_topk_uses_window_group_limit(spark):
    plan = _plan(analytics.top_orders_per_segment_year(spark, SF_ORACLE))
    assert "WindowGroupLimit" in plan  # rank-filter optimized to per-group top-K


def test_media_stats_never_reads_payload(spark):
    # metadata queries on a media table must not scan the binary column;
    # media_from_documents synthesizes payloads, so check its input pruning:
    # only doc_id/text/source may be read from the documents scan
    from pipeline_pyspark_etl_imdb_spark.operators.multimodal import (
        media_from_documents,
        media_stats,
    )

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    plan = _plan(media_stats(media_from_documents(docs)))
    read_schema = plan.split("ReadSchema:")[-1]
    assert "lang" not in read_schema and "n_chars" not in read_schema


def test_semi_join_stays_semi(spark):
    plan = _plan(analytics.orders_with_lineitems_semi(spark, SF_ORACLE))
    assert "LeftSemi" in plan


@pytest.mark.parametrize(
    "fn", [analytics.year_order_kpi, analytics.order_price_histogram]
)
def test_aggregations_have_partial_phase(spark, fn):
    # map-side combine: HashAggregate appears twice (partial + final)
    plan = _plan(fn(spark, SF_ORACLE))
    assert plan.count("HashAggregate") >= 2


def test_heavy_hitters_partial_agg_and_broadcast_total(spark):
    # the hot-key groupBy must map-side combine (that's what absorbs the
    # skew), and the single-row total must broadcast, not shuffle
    from pipeline_pyspark_etl_imdb_spark.plans.registry import QUERIES

    plan = _plan(QUERIES["heavy_hitter_users"](spark, SF_ORACLE))
    assert plan.count("HashAggregate") >= 2
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_vocab_build_uses_take_ordered_not_global_sort(spark):
    # the top-V cut must plan as TakeOrderedAndProject (per-partition
    # top-V merged at the driver); a full global Sort before the limit
    # would single-task the whole token distribution at scale
    from pipeline_pyspark_etl_imdb_spark.plans.registry import QUERIES

    plan = _plan(QUERIES["vocab_top_tokens"](spark, SF_ORACLE))
    assert "TakeOrderedAndProject" in plan


def test_corpus_build_single_dedup_shuffle(spark):
    # quality filter (inline expression, pushed to the scan) + canonical
    # min-id window + mix + shard must fuse into ONE plan with exactly
    # one shuffle: the window's exchange on md5(text). No joins at all.
    from pipeline_pyspark_etl_imdb_spark.plans.registry import QUERIES

    plan = _plan(QUERIES["corpus_build_manifest"](spark, SF_ORACLE))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_scd2_single_window_shuffle(spark):
    # both window passes share one (key, order) partitioning: exactly one
    # exchange, and no extra sort beyond the window's own
    from pipeline_pyspark_etl_imdb_spark.plans.registry import QUERIES

    plan = _plan(QUERIES["scd2_customer_priority"](spark, SF_ORACLE))
    assert plan.count("Exchange") == 1


def test_winsorized_broadcasts_percentiles(spark):
    # the 3-row percentile frame must broadcast back onto the fact scan;
    # a shuffle join here would move the fact table for a tiny dim
    plan = _plan(analytics.winsorized_price_stats(spark, SF_ORACLE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_order_gap_profile_single_exchange(spark):
    # all five navigation functions share one (custkey, order) window
    # partitioning: exactly one shuffle serves lag/lead/first/last/nth
    plan = _plan(analytics.order_gap_profile(spark, SF_ORACLE))
    assert plan.count("Exchange hashpartitioning") == 1


def test_funnel_fold_no_joins_two_aggs(spark):
    # funnel = one user-keyed aggregation + the tiny step-count
    # aggregation; the k-step join cascade shape is banned
    from pipeline_pyspark_etl_imdb_spark.plans.registry import FUNNEL_STEPS, QUERIES

    plan = _plan(QUERIES["funnel_view_click_purchase"](spark, SF_ORACLE))
    assert "Join" not in plan
    # the step-type filter is pushed into the parquet scan
    fmt = _formatted(QUERIES["funnel_view_click_purchase"](spark, SF_ORACLE))
    assert "In(event_type" in fmt


def test_incremental_merge_reaggregates_partials_only(spark):
    # the merge's final aggregation runs over the UNION of two partials —
    # partial aggregation on both branches (HashAggregate >= 2 per branch,
    # plus the merge agg), and no join anywhere
    from pipeline_pyspark_etl_imdb_spark.plans.registry import QUERIES

    plan = _plan(QUERIES["incremental_daily_kpi"](spark, SF_ORACLE))
    assert "Union" in plan
    assert "Join" not in plan


def test_runtime_bloom_filter_prunes_fact_side(spark):
    # 100 TB lever: a selective dim-side filter must inject a runtime
    # Bloom filter onto the fact scan (bloom_filter_agg on the creation
    # side, might_contain on the application side) so fact rows that can
    # never join are dropped BEFORE the shuffle. Default thresholds
    # (creation <= 10 MB, application >= 10 GB) only trigger at real
    # scale, so simulate them here; the conf surface is what we gate.
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n"))
        plan = _plan(joined)
        assert "bloom_filter_agg" in plan  # built over the filtered dim keys
        assert "might_contain" in plan  # applied on the fact side pre-shuffle
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_join_strategy_hints_control_physical_plan(spark):
    # physical join strategy must be user-controllable per join: with
    # broadcast off the planner defaults to SortMergeJoin; a SHUFFLE_HASH
    # hint on the smaller side must flip it (no sort phase — the right
    # call when one side is modest and sorting the big side would
    # dominate). Strategy control is a first-class 100 TB tuning surface.
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
        plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
        assert "SortMergeJoin" in _plan(plain)
        hinted = li.join(
            orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey
        )
        hplan = _plan(hinted)
        assert "ShuffledHashJoin" in hplan
        assert "SortMergeJoin" not in hplan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_partitioned_write_prunes_partitions_on_read(spark, tmp_path):
    # hive-partitioned layout + a partition-key predicate must prune at
    # planning time: the scan's PartitionFilters carries the predicate and
    # only the selected partition's files are read — the layout contract
    # that makes day-ranged queries O(selected days), not O(table)
    from pipeline_pyspark_etl_imdb_spark.sources.parquet_io import write_parquet

    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").withColumn(
        "status", F.col("o_orderstatus")
    )
    path = str(tmp_path / "orders_by_status")
    write_parquet(orders, path, partition_cols=["status"])

    scan = spark.read.parquet(path).where(F.col("status") == "F")
    fmt = _formatted(scan)
    part_filters = fmt.split("PartitionFilters:")[-1].split("\n")[0]
    assert "status" in part_filters and "F" in part_filters
    # pruning is effective: only one of the three status partitions scans
    n_sel = scan.withColumn("__f", F.input_file_name()).select("__f").distinct().count()
    n_all = (
        spark.read.parquet(path)
        .withColumn("__f", F.input_file_name())
        .select("__f")
        .distinct()
        .count()
    )
    assert n_sel < n_all


def test_roster_listagg_broadcasts_dim(spark):
    """Ordered-set aggregate: the 25-row nation dim must broadcast and the
    listagg run as a partial+final ObjectHashAggregate pair — no
    sort-merge shuffle of the customer side."""
    from pipeline_pyspark_etl_imdb_spark.plans.registry import QUERIES

    plan = _plan(QUERIES["nation_customer_roster"](spark, SF_ORACLE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("ObjectHashAggregate") == 2  # partial + final


def test_recursive_cte_plans_union_loop(spark):
    """WITH RECURSIVE must compile to the iterative UnionLoop operator —
    not a self-join cascade (one join per depth level would re-shuffle
    the working set log(maxkey) times)."""
    from pipeline_pyspark_etl_imdb_spark.plans.registry import QUERIES

    plan = _plan(QUERIES["custkey_tree_depth"](spark, SF_ORACLE))
    assert "UnionLoop" in plan
    assert "Join" not in plan


def test_lateral_decorrelates_to_window_group_limit(spark):
    """The correlated LATERAL ... ORDER BY ... LIMIT k must decorrelate
    into the WindowGroupLimit per-key top-k (same physical family as the
    rank-filter path), joined broadcast — never a per-row nested-loop or
    cartesian replay of the lineitem scan."""
    from pipeline_pyspark_etl_imdb_spark.plans.registry import QUERIES

    plan = _plan(QUERIES["supplier_top_orders_lateral"](spark, SF_ORACLE))
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's runtime skew-join must detect and SPLIT a pathological hot
    key — the no-code-change complement to the manual salting operators
    (operators/skew.py). Thresholds are lowered (scoped, restored) so the
    fixture-sized hot key triggers the same detection a multi-GB hot
    partition triggers in production; the gate asserts the finalized
    adaptive plan actually marked the sort-merge join skew=true."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        hot = spark.range(60_000).select(
            F.lit(0).alias("k"), F.lpad(F.col("id").cast("string"), 64, "x").alias("pad")
        )
        tail = spark.range(1, 200).select(
            F.col("id").alias("k"), F.lit("t").alias("pad")
        )
        right = spark.range(200).select(
            F.col("id").alias("k"), F.lit("r").alias("val")
        )
        joined = hot.unionByName(tail).join(right, "k")
        # collect THIS frame: count() builds a different query execution
        # and would leave joined's adaptive plan unfinalized
        assert len(joined.collect()) == 60_000 + 199
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not mark the join skewed"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_kmv_sketch_uses_window_group_limit(spark):
    """The rank<=k over ascending hash must compile to WindowGroupLimit
    (per-partition top-k before the shuffle) — without it every distinct
    (group, hash) row crosses the wire and the sketch is no longer
    bounded-memory at scale."""
    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import kmv_sketch

    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    plan = _plan(kmv_sketch(ev, ["event_type"], "user_id", k=64))
    assert "WindowGroupLimit" in plan
    # map-side partial dedup of (group, hash) before the exchange
    assert "partial_" in plan or "HashAggregate" in plan


def test_semdedup_no_cartesian_and_cached_base(spark):
    """SemDeDup's pair generation must stay a cluster equi-join (never a
    cartesian/nested-loop product), and the three consumers of the
    normed base must read ONE cached subtree."""
    from pipeline_pyspark_etl_imdb_spark.operators.semdedup import semdedup_lsh
    from pipeline_pyspark_etl_imdb_spark.operators.util import release_tracked

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    try:
        plan = _plan(semdedup_lsh(emb, threshold=0.35))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "InMemoryTableScan" in plan
    finally:
        release_tracked()


def test_bpe_pair_counts_partially_aggregated(spark):
    """Each BPE round's pair count is ONE groupBy with a map-side partial
    phase over the distinct-word table, and the winning pair comes from
    TakeOrderedAndProject (limit 1), not a global sort."""
    from pipeline_pyspark_etl_imdb_spark.operators.bpe import word_counts

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    seg = word_counts(docs).select(
        "word",
        "wcount",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("syms"),
    )
    pair_struct = F.expr(
        "transform(sequence(1, size(syms) - 1),"
        " i -> struct(syms[i - 1] AS l, syms[i] AS r))"
    )
    top = (
        seg.where(F.size("syms") >= 2)
        .select("wcount", F.explode(pair_struct).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("wcount").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
        .limit(1)
    )
    plan = _plan(top)
    assert "TakeOrderedAndProject" in plan
    assert "partial_sum" in plan


def test_bm25_small_sides_broadcast(spark):
    """The |Q|-sized idf table must broadcast against the tf table, and
    both tf/df aggregations must have map-side partial phases — the corpus
    token stream shuffles only for the bounded (doc, query-term) groups."""
    from pipeline_pyspark_etl_imdb_spark.operators.text import bm25_scores

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    plan = _plan(bm25_scores(docs, ["vector", "hash", "merge"]))
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan


def test_contrastive_negatives_group_limit_and_broadcast_anchors(spark):
    """Per-anchor selection must compile to WindowGroupLimit (each
    partition forwards at most |anchors|*k rows) and the anchor side must
    be broadcast — the corpus never shuffles for candidate generation."""
    from pipeline_pyspark_etl_imdb_spark.operators.corpus import (
        contrastive_negatives,
    )

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    plan = _plan(contrastive_negatives(docs, [1, 2, 3], k=4))
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan  # broadcast nested loop, not SMJ cross


def test_containment_pairs_equi_joins_only(spark):
    """The containment candidate path must be pure equi-joins: the
    all-pairs instr() formulation would plan a CartesianProduct /
    nested-loop join; the rarest-interior-shingle design replaces it
    with a shingle equi-join plus id-keyed text fetches. Any cross-join
    creeping in here turns exact containment dedup quadratic at 100 TB."""
    from pipeline_pyspark_etl_imdb_spark.operators.neardup import (
        containment_pairs,
    )

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    plan = _plan(containment_pairs(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # per-doc rarest pick is a partial-aggregated struct-min, not a window
    assert "partial_min" in plan


def test_dedup_cascade_equi_joins_only(spark):
    """The cascade composes three dedup stages; its physical plan must
    stay pure equi-join end to end — a CartesianProduct or nested-loop
    join in ANY stage (exact group-back, containment candidates, shingle
    Jaccard, component propagation) would reintroduce the all-pairs
    shape the individual operators are designed to avoid."""
    from pipeline_pyspark_etl_imdb_spark.operators.neardup import dedup_cascade

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    plan = _plan(dedup_cascade(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_privacy_audits_are_two_level_partial_aggregates(spark):
    """k-anonymity / l-diversity reports must partially aggregate map-side
    (equivalence classes bounded by the quasi domain) with no window."""
    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import (
        k_anonymity_audit,
        l_diversity_audit,
    )

    cust = spark.read.parquet(f"{SF_ORACLE}/customer.parquet")
    for df in (
        k_anonymity_audit(cust, ["c_nationkey", "c_mktsegment"], k=5),
        l_diversity_audit(cust, ["c_nationkey"], "c_mktsegment", l=5),
    ):
        plan = _plan(df)
        assert "partial_count" in plan
        assert "Window" not in plan


def test_triangle_wedge_joins_broadcast_when_edges_small(spark):
    """Under the size guard both the wedge join and the closure join must
    broadcast the edge side: the wedge stream (sum deg^2 rows — 60x the
    edge count on the sf0.1 co-purchase graph) stays map-side and never
    crosses the wire. Measured 22.6 s -> ~7 s at sf0.1."""
    from pipeline_pyspark_etl_imdb_spark.operators import triangles
    from pipeline_pyspark_etl_imdb_spark.operators.util import release_tracked

    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    try:
        plan = _plan(
            triangles.triangle_participation(triangles.cooccurrence_edges(li))
        )
        assert plan.count("BroadcastHashJoin") >= 2
        assert "partial_count" in plan  # corner credit partially aggregated
    finally:
        release_tracked()


def test_lsh_verified_pairs_broadcasts_candidates(spark):
    """The verify stage must join per-doc shingle ARRAYS against the
    broadcast candidate list (two BroadcastHashJoins) — never re-explode
    shingle rows per candidate. Measured 10.9 s -> 3.3 s at sf0.1."""
    from pipeline_pyspark_etl_imdb_spark.operators.neardup import lsh_verified_pairs
    from pipeline_pyspark_etl_imdb_spark.operators.util import release_tracked

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    try:
        plan = _plan(lsh_verified_pairs(docs, threshold=0.8))
        assert plan.count("BroadcastHashJoin") >= 2
        assert "SortMergeJoin" not in plan
    finally:
        release_tracked()


def test_int8_quantize_single_partial_max_battery_no_explode(spark):
    """The scale vector must come from ONE partially-aggregated max
    battery (dim columns, map-side collapse to a single row) broadcast
    back — never an (id, dim) posexplode shuffle."""
    from pipeline_pyspark_etl_imdb_spark.operators.quantize import int8_quantize

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    plan = _plan(int8_quantize(emb))
    assert "partial_max" in plan
    assert "Generate" not in plan  # no explode anywhere
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_curriculum_stages_no_single_partition_data_window(spark):
    """The ntile must ride the distributed rank machinery: the only
    partition-less window sees the per-partition offset rows (~cluster
    size), never the documents."""
    from pipeline_pyspark_etl_imdb_spark.operators.corpus import curriculum_stages

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    plan = _plan(curriculum_stages(docs, n_stages=4))
    # the doc-sized window is partitioned by __pid; the offsets frame is
    # broadcast back
    assert "RangePartitioning" in plan or "rangepartitioning" in plan.lower()
    assert "BroadcastHashJoin" in plan


def test_ols_trend_single_partial_aggregate(spark):
    """Grouped OLS must be ONE partially-aggregated groupBy (6 exact sums
    per segment) — no window, no per-group iteration."""
    from pipeline_pyspark_etl_imdb_spark.plans.analytics import segment_price_trend

    plan = _plan(segment_price_trend(spark, SF_ORACLE))
    assert "partial_" in plan
    assert "Window" not in plan


def test_threshold_metrics_one_pass(spark):
    """All thresholds must come from ONE aggregate over the data (the
    per-threshold counters live in a single partial-agg row), never one
    job per threshold."""
    from pipeline_pyspark_etl_imdb_spark.operators.evalmetrics import (
        threshold_metrics,
    )
    from pipeline_pyspark_etl_imdb_spark.operators.text import quality_expr
    from pyspark.sql import functions as FF

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
        quality_expr(FF.col("text")).alias("q"), (FF.col("lang") == "en").alias("y")
    )
    plan = _plan(threshold_metrics(docs, "q", "y", [0.4, 0.5, 0.6]))
    assert plan.count("HashAggregate") <= 4  # partial+final, not per-threshold
    assert "partial_sum" in plan


def test_kmv_jaccard_union_cut_group_limited(spark):
    """The union-sketch cut must compile to WindowGroupLimit and the pair
    enumeration must broadcast the group list — sketch rows only, the
    distinct sets never shuffle pairwise."""
    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import (
        kmv_jaccard_pairs,
    )

    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    plan = _plan(kmv_jaccard_pairs(ev, "event_type", "user_id", k=64))
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_psi_drift_reads_data_once(spark):
    """PSI must aggregate the raw data exactly once (bin counts), with the
    totals broadcast back over the bins frame — two aggregate pairs
    total, no second scan of the source."""
    from pipeline_pyspark_etl_imdb_spark.operators.evalmetrics import psi_drift
    from pyspark.sql import functions as FF

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
        (FF.col("n_chars") / 1000.0).alias("v"),
        (FF.col("doc_id") % 2 == 0).alias("half"),
    )
    plan = _plan(psi_drift(docs, "v", "half"))
    assert plan.count("FileScan") == 1
    assert "partial_sum" in plan


def test_dynamic_partition_pruning_from_filtered_dim(spark, tmp_path):
    """Runtime partition pruning: a join on the fact's PARTITION column
    against a dim filtered on a NON-join attribute must inject a
    DynamicPruningSubquery into the fact scan — the fact reads only the
    partitions the dim's surviving keys name, decided at runtime. This is
    the mechanism that makes star joins over a date-partitioned 100 TB
    fact read days, not the table."""
    from pipeline_pyspark_etl_imdb_spark.sources.parquet_io import write_parquet

    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").withColumn(
        "status", F.col("o_orderstatus")
    )
    path = str(tmp_path / "orders_dpp")
    write_parquet(orders, path, partition_cols=["status"])
    fact = spark.read.parquet(path)
    # parquet-backed dim (DPP does not trigger for LocalRelation dims —
    # those constant-fold); the filter on `flag` is only known at runtime
    dim_path = str(tmp_path / "dim")
    spark.createDataFrame(
        [("F", 1), ("O", 2), ("P", 3)], "status string, flag int"
    ).write.parquet(dim_path)
    dim = spark.read.parquet(dim_path).where(F.col("flag") == 1)
    q = fact.join(dim, "status").groupBy("status").count()
    fmt = _formatted(q)
    assert "dynamicpruning" in fmt.lower(), fmt[:2000]
    # and it is effective: only the 'F' partition's rows aggregate
    rows = q.collect()
    assert [r.status for r in rows] == ["F"]


def test_prefix_filter_plan_shape(spark):
    """The per-doc prefix cut runs as a doc-partitioned rank window (the
    limit L is per-document, so WindowGroupLimit cannot apply — the
    filter still drops non-prefix rows before the candidate join), the
    candidate join is an equi-join (never cartesian/nested-loop), and no
    window in the plan is partition-less."""
    from pipeline_pyspark_etl_imdb_spark.operators.neardup import (
        prefix_filter_pairs,
    )
    from pipeline_pyspark_etl_imdb_spark.operators.util import release_tracked

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    try:
        plan = _plan(prefix_filter_pairs(docs, k=3, threshold=0.8))
        assert "Window" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # every windowspec carries the doc partition key
        assert "windowspecdefinition(doc" in plan.replace(" ", "").replace(
            "#", "#"
        ) or "windowspecdefinition(doc" in plan
    finally:
        release_tracked()


def test_key_skew_profile_take_ordered_no_window(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import key_skew_profile

    events = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    plan = _plan(key_skew_profile(events, "user_id", top_n=20))
    # top-N must be a per-partition TakeOrdered merge, never a global
    # sort or a rank window over the key-frequency frame
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert "BroadcastExchange" in plan  # one-row totals frame


def test_span_dedup_trim_window_free(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.importance import span_dedup_trim

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    plan = _plan(span_dedup_trim(docs))
    # the keeper pick is a struct-min INSIDE the span aggregate; a
    # row_number-over-occurrences implementation would show Window here
    assert "Window" not in plan


def test_token_budget_windows_only_on_bounded_frames(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.corpus import select_to_token_budget

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    plan = _plan(select_to_token_budget(docs, token_budget=20_000))
    # the FORBIDDEN shape is a global cumsum window ordered by quality
    # over the corpus — its spec would lead with quality#; every window
    # here is bucket-scoped (prefix sums over the <= n_buckets+1 bucket
    # frame, evaluated once per classification branch, plus the
    # boundary-bucket doc ranking)
    assert "windowspecdefinition(quality#" not in plan
    assert plan.count("Window ") <= 3
    # the doc-ranking window carries a partition list on __bucket
    assert "], [__bucket#" in plan
    # bucket classification frames come back via broadcast joins
    assert "BroadcastExchange" in plan


def test_temperature_mix_single_corpus_aggregate(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.importance import temperature_mix_plan

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    plan = _plan(temperature_mix_plan(docs, token_budget=1_000_000))
    # denominator is a broadcast one-row frame over the domain aggregate
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "Window" not in plan


# --- GLOBAL partition-less-window gate ----------------------------------
# A WindowExec with an empty partition spec moves its whole input to ONE
# partition ("No Partition Defined for Window" warning) — a scale-killer
# iff the input is data-sized. Every query below is audited: its
# partition-less windows consume a BOUNDED frame that does not grow with
# the data. Anything new that plans an empty-partition window must either
# restructure (the reference itself never global-sorts for a top-N,
# /root/reference/src/etl_imdb.py:210-212) or justify itself here.
_BOUNDED_GLOBAL_WINDOWS: dict[str, str] = {
    # ranks.total_order_ranks: the offsets window sees ~#partitions rows
    "quality_auc": "rank partition offsets (~n_partitions rows)",
    "revenue_concentration": "rank partition offsets (~n_partitions rows)",
    "customer_spend_deciles": "rank partition offsets (~n_partitions rows)",
    "curriculum_stages": "rank partition offsets (~n_partitions rows)",
    # calendar- or bin-grain frames, independent of row count
    "revenue_yoy": "year-grain lag (observation span in years)",
    "revenue_seasonal_decomposition": "calendar-day frame",
    "user_km_retention": "day-grain KM curve (observation span in days)",
    "quality_psi_drift": "n_bins-row PSI frame",
    "quality_token_budget": "<= n_buckets+1 histogram prefix-sum frames",
    # vocabulary / candidate cuts applied BEFORE the window
    "vocab_zipf_fit": "top-V vocabulary (V rows)",
    "vocab_top_tokens": "top-V vocabulary (V rows)",
    "hybrid_rrf_retrieval": "per-system top-k fused candidates (<= systems*k)",
    # r4 additions
    "lang_source_contingency": "contingency cells frame (RxC category domain)",
    "customer_rfm_scores": "rank partition offsets x3 (~n_partitions rows)",
    "doc_char_concentration": "rank partition offsets (~n_partitions rows)",
    # total_order_prefix_sums / total_order_ranks offset tables
    "status_price_ks_test": "prefix-sum partition offsets (~n_partitions rows)",
    "token_gini_concentration": "rank partition offsets (~n_partitions rows)",
    # experiment-health battery
    "quality_brier_decomposition": "n_bins-row decomposition frame",
    # time-series diagnostics
    "daily_revenue_acf": "calendar-day frame (mean + lag windows see days)",
    "benford_price_digits": "9-row digit spine total",
    # corpus analysis
    "vocab_coverage_curve": "rank partition offsets (~n_partitions rows)",
    "theilsen_revenue_trend": "rank partition offsets (~n_partitions rows)",
    "quality_decile_lift": "rank offsets + n_tiles-row gains cumsum",
    # r5 inference battery
    "price_mannwhitney_u": "midrank cumsum over DISTINCT cent prices (value-domain-bounded)",
    "event_value_bh_fdr": "BH rank + suffix-max over the m-row battery frame (m = #groups)",
    # r5 cross-source calibration (pooled order stats via total_order_ranks)
    "quality_quantile_normalized": "rank partition offsets (~n_partitions rows)",
}


def _empty_partition_windows(sdf) -> list[str]:
    hits: list[str] = []

    def walk(node):
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            walk(node.initialPlan())
            return
        if name.endswith("QueryStageExec"):
            walk(node.plan())
            return
        if name == "InMemoryTableScanExec":
            try:
                walk(node.relation().cachedPlan())
            except Exception:
                pass
        if "Window" in name:
            try:
                if node.partitionSpec().isEmpty():
                    hits.append(name)
            except Exception:
                pass
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(sdf._jdf.queryExecution().executedPlan())
    return hits


def test_no_unbounded_partitionless_windows_anywhere(spark):
    """Walk EVERY registry query's physical plan — INCLUDING the
    pre-checkpoint plans captured at every eager_checkpoint site, so a
    localCheckpoint adoption can't hide a window from the audit (the r9
    materialize_input lesson); any empty-partition Window node must
    belong to a query on the audited-bounded whitelist. sf0.001 keeps
    the iterative queries' materialization cheap — window partition
    specs don't depend on input statistics."""
    from pipeline_pyspark_etl_imdb_spark.operators.util import (
        capture_prechk_plans,
        drain_prechk_plans,
        release_tracked,
    )
    from pipeline_pyspark_etl_imdb_spark.plans.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    offenders: dict[str, list[str]] = {}
    stale_whitelist = set(_BOUNDED_GLOBAL_WINDOWS)
    capture_prechk_plans(True)
    try:
        for name, fn in QUERIES.items():
            try:
                frames = [fn(spark, sf)]
                frames += drain_prechk_plans()
                hits = [
                    h for df in frames for h in _empty_partition_windows(df)
                ]
            finally:
                release_tracked()
                spark.catalog.clearCache()
            if hits:
                if name in _BOUNDED_GLOBAL_WINDOWS:
                    stale_whitelist.discard(name)
                else:
                    offenders[name] = hits
    finally:
        capture_prechk_plans(False)
    assert not offenders, (
        "queries with partition-less windows not on the audited-bounded "
        f"whitelist: {offenders}"
    )
    # a whitelist entry whose window disappeared is stale — prune it so
    # the audit stays truthful
    assert not stale_whitelist, f"stale whitelist entries: {sorted(stale_whitelist)}"


# Queries whose plan legitimately contains a BroadcastNestedLoopJoin:
# every entry is a crossJoin against a BROADCAST frame whose row count is
# bounded by construction (a one-row global aggregate, a k-row centroid/
# query/battery frame, or a bin/calendar spine) — never a data-sized side.
# The value names the bounded frame so the audit is re-checkable.
_BOUNDED_BROADCAST_NESTED_LOOPS = {
    # one-row global-aggregate frames (totals, moments, cuts, spans)
    "ab_experiment_report": "one-row pooled-moments frame",
    "cuped_experiment_report": "one-row theta/moments frame",
    "did_revenue_estimate": "one-row cut-date frame",
    "decayed_user_engagement": "one-row max-date frame",
    "status_price_ks_test": "one-row group-counts frame",
    "theilsen_revenue_trend": "one-row median-slope frame",
    "en_distinctive_tokens": "one-row corpus-totals frame",
    "event_entropy_rate": "one-row corpus-entropy frame",
    "tfidf_top_terms": "one-row N-docs frame",
    "heavy_hitter_users": "one-row total-count frame",
    "doc_unigram_logprob": "one-row corpus-token-total frame",
    "token_pmi_pairs": "one-row token/pair totals frame",
    "temperature_mixing_plan": "one-row normalizer frame",
    "neyman_order_sample": "one-row allocation-normalizer frame",
    "dsir_doc_weights": "one-row source-ratio normalizer frame",
    "dsir_importance_sample": "one-row source-ratio normalizer frame",
    "join_size_estimate_ol": "one-row per-side key-stats frames",
    "orphan_keys_qa": "one-row per-side key-universe frames",
    "lang_id_kappa": "one-row agreement-totals frame",
    "user_km_retention": "one-row cohort-size frame",
    "event_cusum_changepoints": "one-row mean/sd frame",
    "events_gap_fill": "one-row min/max-day span frame",
    "event_key_skew_profile": "one-row total-count frame",
    "quality_quantile_normalized": "one-row pooled-quantile frame",
    "source_token_jsd": "one-row corpus-totals frame",
    "price_permutation_test": "one-row observed-statistic frame",
    "event_value_bh_fdr": "one-row pooled-moments frame (m-row battery)",
    "customer_bivariate_outliers": "one-row moment/inverse-covariance frame",
    "containment_df_profile": "one-row candidate-budget totals frame",
    "bm25_docs": "one-row avgdl/N frame",
    "rag_chunk_bm25": "one-row avgdl/N frame",
    "retrieval_ndcg_report": "one-row ideal-DCG normalizer frame",
    "hybrid_rrf_retrieval": "one-row per-system cut frames",
    "customer_rfm_scores": "one-row tercile-cuts frame",
    # r10: loop-round plans are captured pre-checkpoint now, so the
    # pagerank round's dangling-mass crossJoin is visible to this gate
    "supplier_pagerank": "one-row dangling-mass frame (per round)",
    "weak_label_report": "one-row corpus-count frame (+5-row LF spine)",
    # k-row broadcast frames (centroids / query vectors / anchors / bins)
    "knn_bruteforce": "k-row query-vector frame",
    "ann_ivf": "k-row centroid frame",
    "ann_recall_report": "k-row query-vector frame",
    "matryoshka_recall16": "k-row query-vector frame",
    "embedding_int8_quantize": "per-dim max battery (one-row, plan-gated)",
    "contrastive_doc_negatives": "k-row broadcast anchor frame",
    "event_audience_overlap": "event-type pair frame (|types|^2 rows)",
}


def _product_joins(sdf) -> list[str]:
    hits: list[str] = []

    def walk(node):
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            walk(node.initialPlan())
            return
        if name.endswith("QueryStageExec"):
            walk(node.plan())
            return
        if name == "InMemoryTableScanExec":
            try:
                walk(node.relation().cachedPlan())
            except Exception:
                pass
        if "CartesianProduct" in name or "BroadcastNestedLoopJoin" in name:
            hits.append(name)
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(sdf._jdf.queryExecution().executedPlan())
    return hits


def test_no_cartesian_products_anywhere(spark):
    """Walk EVERY registry query's physical plan — INCLUDING the
    pre-checkpoint plans captured at every eager_checkpoint site, so a
    localCheckpoint adoption can't hide a product join from the audit
    (the r9 customer_rfm_scores materialize_input lesson): a
    CartesianProduct is forbidden outright (an all-pairs join is never
    the right 100 TB shape), and a BroadcastNestedLoopJoin is allowed
    only for queries on the audited whitelist above, where the broadcast
    side is a bounded (one-row / k-row / spine) aggregate frame. A new
    query that slips an unbounded product past review fails here before
    it ships."""
    from pipeline_pyspark_etl_imdb_spark.operators.util import (
        capture_prechk_plans,
        drain_prechk_plans,
        release_tracked,
    )
    from pipeline_pyspark_etl_imdb_spark.plans.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    offenders: dict[str, list[str]] = {}
    stale_whitelist = set(_BOUNDED_BROADCAST_NESTED_LOOPS)
    capture_prechk_plans(True)
    try:
        for name, fn in QUERIES.items():
            try:
                frames = [fn(spark, sf)]
                frames += drain_prechk_plans()
                hits = [h for df in frames for h in _product_joins(df)]
            finally:
                release_tracked()
                spark.catalog.clearCache()
            cartesian = [h for h in hits if "CartesianProduct" in h]
            if cartesian:
                offenders[name] = cartesian
                continue
            if hits:
                if name in _BOUNDED_BROADCAST_NESTED_LOOPS:
                    stale_whitelist.discard(name)
                else:
                    offenders[name] = hits
    finally:
        capture_prechk_plans(False)
    assert not offenders, (
        "queries planning cartesian/nested-loop products outside the "
        f"audited bounded-broadcast whitelist: {offenders}"
    )
    assert not stale_whitelist, f"stale whitelist entries: {sorted(stale_whitelist)}"


def test_plan_gates_see_through_checkpoints(spark):
    """Coverage meta-test for the capture seam (VERDICT r9 #7): a product
    join hidden behind an eager_checkpoint must still reach the gate
    walker via the captured pre-checkpoint plan. Guards against a future
    checkpoint call site that bypasses eager_checkpoint/record_prechk
    re-opening the blind spot."""
    from pipeline_pyspark_etl_imdb_spark.operators.util import (
        capture_prechk_plans,
        drain_prechk_plans,
        eager_checkpoint,
        release_tracked,
    )

    left = spark.range(6).select(F.col("id").alias("a"))
    one_row = spark.range(4).agg(F.max("id").alias("mx"))
    hidden = left.crossJoin(F.broadcast(one_row))
    capture_prechk_plans(True)
    try:
        out = eager_checkpoint(hidden).select("a", "mx")
        frames = [out] + drain_prechk_plans()
        hits = [h for df in frames for h in _product_joins(df)]
    finally:
        capture_prechk_plans(False)
        release_tracked()
    # the checkpointed frame itself shows only a LogicalRDD scan…
    assert not _product_joins(out)
    # …but the captured pre-checkpoint plan keeps the BNLJ visible
    assert any("BroadcastNestedLoopJoin" in h for h in hits), hits


def test_all_driver_facing_output_schemas_atomic(spark):
    """Every registry query must emit only atomic driver-facing columns.

    The driver's pandas canonicalizer sorts the result frame before
    hashing and cannot factorize list/dict cells — an ArrayType (or Map/
    Struct/Binary) output column is guaranteed to go red at the signal
    of record even when every value is correct (r1 media_features, r4
    embedding_int8_quantize / embedding_jl_projection all failed this
    exact way). Schema construction needs no data, so this walks all
    registry plans at sf0.001 and asserts every output field is atomic.
    Array-form operator APIs stay available to library callers; only the
    registered driver-facing shape must be exploded/encoded to scalars.
    """
    from pyspark.sql import types as T

    from pipeline_pyspark_etl_imdb_spark.operators.util import release_tracked
    from pipeline_pyspark_etl_imdb_spark.plans.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    non_atomic = (T.ArrayType, T.MapType, T.StructType, T.BinaryType)
    offenders: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        try:
            schema = fn(spark, sf).schema
        finally:
            release_tracked()
            spark.catalog.clearCache()
        bad = [
            f"{f.name}: {f.dataType.simpleString()}"
            for f in schema.fields
            if isinstance(f.dataType, non_atomic)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "queries shipping non-atomic columns to the driver (explode to "
        f"scalar rows — media_features precedent): {offenders}"
    )


def test_weighted_edge_build_partial_aggregates_and_prunes(spark):
    """The graph-path family's shared edge build (r9,
    triangles.cooccurrence_weighted_edges): the co_count groupBy must
    partial-aggregate (map-side combine — the pair stream is deg(order)^2
    rows, the aggregate is pair-domain), and the lineitem scan must read
    only the two graph columns."""
    from pipeline_pyspark_etl_imdb_spark.operators.triangles import (
        cooccurrence_weighted_edges,
    )

    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet").where(
        F.col("l_partkey") % 4 == 0
    )
    df = cooccurrence_weighted_edges(li)
    plan = _plan(df)
    assert "partial_count" in plan or "partial_" in plan  # map-side combine
    fplan = _formatted(df)
    read_schema = fplan.split("ReadSchema:")[-1].split("\n")[0]
    assert "l_orderkey" in read_schema and "l_partkey" in read_schema
    assert "l_extendedprice" not in read_schema  # untouched columns pruned
    assert "l_comment" not in read_schema
