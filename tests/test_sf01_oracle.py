"""Opt-in sf0.1 oracle re-check for the numerically sensitive queries
(``pytest -m sf01``; excluded from the default run by pytest.ini).

The sf0.01 fixtures have narrow value ranges; the histogram-narrowing and
DECIMAL paths have RANGE-dependent edge cases — the 2^53 div-bucketing
and round-before-cast bugs found in r3, and the int64-wrap bucket bug
found in r4, were all range bugs the small fixture couldn't trigger.
This suite runs the exact medians / MAD / CUPED / AUC / PSI / OLS /
seasonal / attribution / calibration family against the identical DuckDB
oracle protocol at 10x the data."""

import pytest

import __spark_entry__ as entry_mod
from tests.oracle_utils import compare_frames, duckdb_conn

SF01 = "/root/testdata/sf0.1"

# the numerically sensitive subset: iterative integer walks, pooled
# float moments, rank statistics, bin-boundary classifications
SENSITIVE = [
    "lineitem_exact_median",
    "status_exact_median",
    "lineitem_weighted_median",
    "event_value_mad_anomalies",
    "status_price_mad_anomalies",
    "cuped_experiment_report",
    "ab_experiment_report",
    "quality_auc",
    "quality_psi_drift",
    "quality_threshold_metrics",
    "quality_calibration",
    "quality_conformal_gate",
    "segment_price_trend",
    "vocab_zipf_fit",
    "revenue_seasonal_decomposition",
    "event_dow_seasonality",
    "event_cusum_changepoints",
    "user_km_retention",
    "decayed_user_engagement",
    "revenue_attribution_ushape",
    "part_association_rules",
    "temperature_mixing_plan",
    "quality_token_budget",
    "lang_token_entropy",
    "neyman_order_sample",
    "customer_spend_deciles",
    "revenue_concentration",
    "status_price_quantile_sketch",
    "embedding_jl_projection",
    "matryoshka_recall16",
    "embedding_int8_quantize",
    "winsorized_price_stats",
    # r4 additions
    "status_price_iqr",
    "lineitem_trimmed_mean",
    "lang_source_contingency",
    "token_pmi_pairs",
    "customer_rfm_scores",
    "doc_char_concentration",
    # r4 statistics batch (rank walks, CDF sups, float folds, md5 draws)
    "priority_price_bands",
    "status_price_ks_test",
    "token_gini_concentration",
    "order_price_bootstrap_ci",
    "dsir_importance_sample",
    "doclen_hill_tail",
    "doc_readability",
    # experiment-health battery (pooled moments, WH cube root, date cut)
    "experiment_srm_check",
    "experiment_power_mde",
    "did_revenue_estimate",
    "quality_brier_decomposition",
    # time-series & QA batch (float folds over day frames, exact decimals)
    "daily_revenue_acf",
    "theilsen_revenue_trend",
    "order_total_reconciliation",
    "benford_price_digits",
    # corpus-analysis batch (ln folds, rank cuts)
    "vocab_coverage_curve",
    "en_distinctive_tokens",
    # behavior-dynamics + concentration + gains batch
    "event_entropy_rate",
    "user_burstiness",
    "parttype_supplier_hhi",
    "quality_decile_lift",
    # r5 rows-only -> exact-oracle conversions (integer-exact kernels,
    # byte-level payload replay, PAV minimax, unrolled iterations)
    "copurchase_communities",
    "copurchase_k_core",
    "quality_isotonic_calibration",
    "media_ahash_values",
    "media_audio_fingerprints",
    # r5 additions (inference battery, containment dedup, corpus JSD,
    # compaction planning) — rank walks, md5 coin draws, A&S polynomial
    # p-values, entropy folds, exact byte cumsums
    "price_mannwhitney_u",
    "event_value_runs_test",
    "priority_price_anova",
    "price_permutation_test",
    "event_value_bh_fdr",
    "segment_spearman",
    "customer_bivariate_outliers",
    "doc_containment_pairs",
    "source_token_jsd",
    "doc_compaction_plan",
    # r5 rows-only -> oracle conversion #6: unrolled float power iteration
    # (no comparisons in the update rule; cut margin measured 4.6e-9)
    "supplier_pagerank",
    # r5 addition: integer-exact BFS layers, 4 unrolled rounds
    "copurchase_bfs_hops",
    # r5 addition: midrank -> pooled interpolated quantile double tree
    "quality_quantile_normalized",
    # r6 rows-only -> oracle conversions: unrolled integer-exact merge
    # rounds, delimited-symbol replace() fold (see oracles._bpe_rounds_sql)
    "bpe_merge_table",
    "bpe_token_counts",
    "bpe_doc_token_budget",
    "bpe_source_fertility",
    # r6 addition: BIGINT-exact containment candidate-budget profile
    "containment_df_profile",
    # r6 addition: stage-ordered dedup survivorship composite
    "dedup_cascade_report",
    # r6 addition: cross-split near-dup leakage (eval integrity)
    "split_leakage_report",
    # r6 suite growth (VERDICT r5 item #6): the 38 oldest-green (r1)
    # oracle-backed queries, none of which had ever run at sf0.1 under
    # the oracle protocol — the suite has caught every scale-revealed
    # bug so far (DuckDB decimal 1-ulp, CUSUM fold order, md5 hotspot)
    "ann_lsh",
    "customer_order_profile_left",
    "customer_running_spend",
    "customers_without_orders_anti",
    "dedup_canonical_corpus",
    "dedup_components",
    "dedup_lineitem_latest",
    "distinct_segments",
    "doc_fingerprint",
    "exact_dup_groups",
    "forecast_revenue_change",
    "knn_bruteforce",
    "lang_id",
    "lineitem_rollup",
    "lsh_buckets",
    "media_decode",
    "media_frames",
    "media_resize",
    "media_stats",
    "nation_role_set_ops",
    "null_marker_cast",
    "order_price_histogram",
    "order_status_priority_cube",
    "orders_with_lineitems_semi",
    "part_type_words",
    "part_word_bridge",
    "pricing_summary",
    "quality_score",
    "return_share_by_year",
    "revenue_yoy",
    "segment_price_quantiles",
    "simhash_pairs",
    "simhash_values",
    "sql_segment_leaders",
    "subtoken_count",
    "text_stats",
    "top_orders_per_segment_year",
    "year_order_kpi",
    # r6 full-registry completion: the remaining 123 oracle-backed
    # queries, enrolling the ENTIRE oracle-backed registry (245) at
    # sf0.1. Grouped by family.
    # warehouse lifecycle / QA
    "merge_upsert_customers",
    "scd2_customer_priority",
    "column_profile_orders",
    "contamination_check",
    "customer_snapshot_diff",
    "incremental_ingest_dedup",
    "incremental_daily_kpi",
    "incremental_join_delta",
    "signed_join_refresh",
    "signed_daily_kpi_refresh",
    "orders_pit_priority",
    "orders_contract_report",
    "orphan_keys_qa",
    "k_anonymity_customers",
    "l_diversity_customers",
    "bloom_contamination_check",
    "part_zorder_key",
    "event_key_skew_profile",
    "skew_safe_flag_totals",
    "skew_safe_status_revenue",
    "null_safe_bucket_join",
    "join_size_estimate_ol",
    # sessionization / event-time / streaming-batch
    "events_sessionize",
    "session_top_paths",
    "event_ohlc_bars",
    "events_tumbling_kpi",
    "events_hourly_rollup",
    "events_sliding_counts",
    "events_gap_fill",
    "user_activity_spans",
    "user_inter_arrival",
    "ema_user_value",
    "trailing_week_spend",
    "event_value_stats",
    "event_value_anomalies",
    "event_type_transitions",
    "events_variant_stats",
    "events_json_kpi",
    "events_props_struct",
    "events_user_pivot",
    "event_counts_unpivot",
    "purchase_last_click_asof",
    "purchases_near_errors",
    "funnel_view_click_purchase",
    "funnel_time_to_convert",
    "cohort_weekly_retention",
    "order_gap_profile",
    "order_calendar_profile",
    "daily_orders_vs_events_full",
    # text / corpus construction / importance
    "tfidf_top_terms",
    "heavy_hitter_users",
    "gopher_quality_flags",
    "repetition_score",
    "pii_redact",
    "ngram_stats",
    "vocab_top_tokens",
    "doc_bigram_logprob",
    "doc_unigram_logprob",
    "doc_chunks",
    "doc_segments_udtf",
    "chunk_dedup_corpus",
    "repeated_spans",
    "span_dup_coverage",
    "span_dedup_trim",
    "token_feature_hash",
    "part_name_features",
    "part_string_battery",
    "shard_assignment",
    "domain_mix",
    "sequence_packing",
    "corpus_build_manifest",
    "group_doc_sample",
    "global_doc_sample",
    "weighted_doc_sample",
    "dataset_split_assign",
    "dsir_doc_weights",
    "quality_funnel_report",
    "mixing_epochs_plan",
    "lang_id_confusion",
    "lang_id_kappa",
    "label_confusion_report",
    # dedup / similarity / retrieval
    "minhash_candidates",
    "lsh_verified_pairs",
    "jaccard_pairs",
    "minhash_jaccard_estimates",
    "prefix_filter_pairs",
    "tfidf_cosine_pairs",
    "embedding_neardup",
    "semdedup_lsh",
    "dedup_signal_consensus",
    "brand_entity_resolution",
    "brand_fuzzy_pairs",
    "ann_ivf",
    "ann_pq",
    "ann_recall_report",
    "bm25_docs",
    "rag_chunk_bm25",
    "hybrid_rrf_retrieval",
    "retrieval_ndcg_report",
    "embedding_vector_stats",
    "embedding_prototype_scores",
    "kmv_user_sketch",
    "cms_user_event_counts",
    # graph
    "copurchase_triangles",
    "copurchase_clustering",
    "copurchase_assortativity",
    "copurchase_link_prediction",
    "custkey_tree_depth",
    "nation_customer_roster",
    # relational / SQL-surface battery
    "region_revenue",
    "order_grouping_sets",
    "orders_above_global_avg",
    "pipe_priority_revenue",
    "supplier_top_orders_lateral",
    "user_type_share_map",
    "media_features",
    "media_decode_real",
    "event_audience_overlap",
    "event_type_trigrams",
    "lang_ngram_diversity",
    "event_value_bands",
    "contrastive_doc_negatives",
    "curriculum_stages",
    # r6 continuation: kmeans family rows-only -> hash-oracle conversions
    # (unrolled Lloyd CTEs; argmin / cosine margins measured 5+ orders
    # above cross-engine float spread at every SF)
    "embedding_kmeans",
    "semdedup_kmeans",
    "kcenter_diversity_picks",
    # r6 continuation addition: weak-supervision LF diagnostics
    "weak_label_report",
    # r9: the graph-path family extensions (bounded-hop weighted SSSP,
    # label-budget product-automaton reachability)
    "copurchase_sssp",
    "copurchase_label_reachability",
]


def test_sf01_list_covers_every_oracle_backed_query():
    """Completeness meta-gate (the margin-floor-gate discipline): this
    hand-maintained list long ago drifted from 'numerically sensitive
    subset' into 'everything oracle-backed' — which is the right
    coverage, so pin it. A new oracle-backed registry query that is not
    added here would silently skip the sf0.1 gate (copurchase_sssp did,
    for one round-half, found r9)."""
    oracle_backed = set(entry_mod.oracle_sql())
    missing = oracle_backed - set(SENSITIVE)
    stale = set(SENSITIVE) - oracle_backed
    assert not missing, f"oracle-backed queries missing from the sf0.1 gate: {sorted(missing)}"
    assert not stale, f"sf0.1 entries without an oracle/registry row: {sorted(stale)}"


@pytest.fixture(scope="module")
def oracle01():
    conn = duckdb_conn(SF01)
    yield conn
    conn.close()


@pytest.mark.sf01
@pytest.mark.parametrize("name", SENSITIVE)
def test_sensitive_query_matches_oracle_at_sf01(spark, oracle01, name):
    from pipeline_pyspark_etl_imdb_spark.operators.util import release_tracked

    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert name in queries, f"unknown registry query {name}"
    assert name in oracles, f"{name} has no oracle"
    try:
        spark_pdf = queries[name](spark, SF01).toPandas()
        oracle_pdf = oracle01.execute(oracles[name]).df()
        problems = compare_frames(spark_pdf, oracle_pdf)
        assert not problems, f"{name} @ sf0.1:\n" + "\n".join(problems)
    finally:
        release_tracked()
        spark.catalog.clearCache()
