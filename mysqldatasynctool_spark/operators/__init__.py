"""Operator library.

Each module exposes:

- ``QUERIES``: dict[name, callable(spark, sf_dir) -> DataFrame]
- ``ORACLES``: dict[name, str] — equivalent ANSI SQL for DuckDB, on the
  fixture views. Keys absent from ``ORACLES`` get the driver's weaker
  rows-only check (reserved for genuinely non-SQL-expressible ops).

Numeric discipline (why the DECIMAL casts): the driver hash-compares
values bit-for-bit. ``SUM(double)`` is order-dependent in the last
bits, and Spark/DuckDB will not add in the same order. Every aggregate
over a noisy double therefore casts to an exact DECIMAL *before* the
SUM (per-row double arithmetic is deterministic; the decimal sum is
exact and order-independent) and casts the total back to DOUBLE. AVGs
are expressed as decimal-sum / count in both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: Registration order doubles as VERIFICATION PRIORITY: the driver
#: walks ``queries()`` in order under a finite budget (it records
#: exactly the first 50 entries), so the entries that most need a
#: fresh correctness record go first; everything else keeps its
#: cumulative green row from an earlier round and comes after in
#: stable order.
#:
#: ROUND-19 ROTATION (r18 verdict item 2; end-of-round refresh of
#: tools/correctness_union.py's suggestion): positions 1-50 cover 50
#: of the 52 STALE-GREEN entries — code changed after their last
#: green driver record — i.e. the r18 fastdec/digest/checkpoint block
#: (q1/q1_fast/q3/q5/q7 and the converted TPC-H block, cdc_apply,
#: weighted_median, the anomaly/sessionization events block, …) PLUS
#: every round-19 rewrite (hybrid_rrf, pca_power_iteration,
#: heavy_hitters, bm25-sharing entries, page_checksums, scd2/
#: point-in-time, fuzzy_ed1, dim_truncation_audit, knn_label_vote,
#: fk_discovery, zorder, rfm, incremental_dedup). Two stale entries
#: wait for the next slate: migration_row_diff (REVERTED to the code
#: its green record graded — lowest risk) and
#: migration_partition_advisor (r17-green, displaced for the
#: round-19-rewritten dim_truncation_audit). Everything else keeps
#: its previous relative order (stable), oldest-green-record-first.
VERIFY_PRIORITY: tuple[str, ...] = (
    "events_sessionization",
    "join_skew_salted",
    "events_anomaly_salted",
    "q15_top_supplier",
    "events_anomaly_zscore",
    "text_unigram_perplexity",
    "agg_rfm_segmentation",
    "window_pareto_cumshare",
    "similarity_ann_recall_report",
    "migration_incremental",
    "text_bm25_topk",
    "similarity_cluster_topics",
    "similarity_hybrid_rrf",
    "similarity_pca_power_iteration",
    "events_hypertable_rollup",
    "migration_cdc_apply",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q14_promo_revenue",
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicates",
    "q21_waiting_supplier_agg",
    "q2_min_cost_supplier",
    "q6_forecast_revenue",
    "q20_potential_promotion",
    "events_session_window_builtin",
    "join_bloom_pruned_semi",
    "pipeline_incremental_dedup",
    "text_heavy_hitters",
    "window_time_range_frame",
    "migration_column_profile",
    "similarity_knn_label_vote",
    "events_zorder_key",
    "join_fuzzy_ed1",
    "join_point_in_time",
    "migration_page_checksums",
    "events_incremental_rollup",
    "agg_weighted_median",
    "agg_cohort_ltv",
    "agg_gini_concentration",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "join_range_nonequi",
    "agg_rollup",
    "similarity_dim_truncation_audit",
    "q1_pricing_summary_fast",
    "migration_fk_discovery",
    "similarity_lsh_bucketed",
    "similarity_label_centroids",
    "similarity_quantize_int8",
    "agg_percentiles",
    "agg_histogram_fixed_bins",
    "migration_pk_catalog",
    "events_sliding_distinct_sketch_merge",
    "agg_approx_distinct",
    "streaming_run_funnel_join_left",
    "streaming_run_funnel_join",
    "dedup_substring_spans",
    "events_interval_overlap_join",
    "agg_linear_fit",
    "events_funnel_conversion",
    "graph_triangle_count",
    "q11_important_stock",
    "q22_global_sales_opportunity",
    "scalar_functions",
    "sort_limit_topk",
    "date_arithmetic",
    "join_cross",
    "pivot_status_priority",
    "unpivot_part_metrics",
    "agg_grouping_sets",
    "agg_max_by",
    "agg_moments_manual",
    "agg_correlation_manual",
    "agg_percentiles_exact",
    "join_asof",
    "string_functions2",
    "null_conditional",
    "sql_cte_subqueries",
    "window_value_functions",
    "window_topk_per_group",
    "window_rank_functions",
    "window_lag_lead",
    "window_running_sum",
    "window_range_frame",
    "events_tumbling_window",
    "events_sliding_window",
    "setop_union_all",
    "setop_union_distinct",
    "setop_intersect",
    "setop_except_all",
    "setop_distinct_rows",
    "similarity_pq_audit",
    "events_gap_fill",
    "events_date_functions",
    "migration_catalog_exclude",
    "events_funnel_join",
    "array_functions",
    "events_json_extract",
    "events_map_functions",
    "udf_grouped_agg_pandas",
    "events_retention_cohorts",
    "similarity_topk_bruteforce",
    "migration_scd2_history",
    "pipeline_sample_per_group",
    "events_sliding_distinct_approx",
    "events_ohlc_bars",
    "sql_recursive_supplier_tree",
    "migration_dq_expectations",
    "migration_partition_advisor",
    "agg_market_basket",
    "setop_symmetric_diff",
    "streaming_run_ohlc",
    "streaming_run_session_window",
    "streaming_run_ewma",
    "events_cusum_changepoint",
    "join_asof_nearest",
    "multimodal_phash_dedup",
    "window_running_drawdown",
    "events_markov_transitions",
    "events_burst_detection",
    "agg_robust_outliers",
    "udf_udtf_windows",
    "dedup_simhash",
    "migration_row_diff",
    "q21_waiting_supplier",
    "project_filter",
    "join_left",
    "join_semi",
    "join_anti",
    "join_full_outer",
    "agg_cube",
    "agg_distinct",
    "dedup_minhash_containment",
    "streaming_run_dedup",
    "dedup_shrink_report",
    "dedup_clusters",
    "dedup_lsh_recall_report",
    "pipeline_leakage_safe_split",
    "pipeline_train_val_split",
    "pipeline_global_shuffle",
    "pipeline_end_to_end",
    "events_asof_join",
    "events_asof_join_salted",
    "text_pii_scrub",
    "q4_order_priority",
    "q12_priority_class",
    "q16_supplier_part_counts",
    "q18_large_volume_customers",
    "q13_customer_distribution",
    "similarity_range_search",
    "pipeline_dataset_card",
    "agg_key_skew_report",
    "events_json_variant",
    "events_sliding_distinct_users",
    "graph_degree_stats",
    "graph_pagerank_purchases",
    "migration_schema_audit",
    "multimodal_resize",
    "text_char_entropy",
    "text_gopher_rules",
    "text_source_stats",
    "window_ewma_dyadic",
    "setop_except_distinct",
    "setop_intersect_all",
    "text_bpe_merge_step",
    "similarity_ivfpq_topk",
    "similarity_mmr_rerank",
    "similarity_mmr_ann",
    "similarity_incremental_index",
    "dedup_exact_subset",
    "dedup_exact_text",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_paragraph_exact",
    "text_token_stats",
    "text_quality_score",
    "text_language_id",
    "text_token_count_bpe",
    "text_chunking",
    "text_fingerprint",
    "text_token_frequency",
    "text_tfidf",
    "multimodal_binary_meta",
    "multimodal_decode_features",
    "multimodal_size_partitioned",
    "multimodal_frame_sample",
    "similarity_lsh_multiprobe",
    "dedup_minhash_lsh",
    "similarity_ivf_pandas",
    "similarity_kmeans_step",
    "dedup_semantic_cells",
    "pipeline_cluster_balanced_sample",
    "pipeline_quality_weighted_sample",
    "multimodal_audio_windows",
    "pipeline_token_budget_planner",
    "pipeline_decontaminate",
    "pipeline_pack_sequences",
    "pipeline_sample_stratified",
    "pipeline_repetition_score",
    "pipeline_mix_weights",
    "migration_full_scan_fallback",
    "migration_page_count",
    "migration_pagination_page",
    "migration_stringify",
    "migration_compare_checksums",
)


def teardown_caches() -> int:
    """Registry-level cache teardown (r11 verdict item 2): release any
    persisted frames operators cached across calls — today that is the
    similarity family's one-per-dataset ANN assignment frame. Harnesses
    that run MANY registry entries in one process (bench.py,
    tools/driver_sim.py) call this between entries/families so no
    operator's amortization cache taxes an unrelated query's storage
    memory. Returns the number of frames released."""
    from .similarity import teardown_persisted_caches

    return teardown_persisted_caches()


def reset_trained_state() -> int:
    """Registry-level FULL ANN-state reset: persisted frames AND the
    driver-side trained dicts (IVF centroids, PQ codebooks).
    ``teardown_caches`` keeps the trained dicts by design (production
    amortization); bench.py calls THIS before each COLD_STEADY
    entry's first run so its "cold" sample genuinely includes Lloyd +
    codebook training (r12 advice — shared ``cache_key=sf_dir`` made
    every COLD_STEADY entry after the first report a train-free
    "cold"). Returns the number of trained states dropped."""
    from .similarity import reset_trained_state as _reset

    return _reset()


def collect_registry() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Merge QUERIES/ORACLES from every operator module."""
    from . import (
        advanced,
        compare,
        dedup,
        events,
        graph,
        migration,
        multimodal,
        pipeline,
        relational,
        setops,
        similarity,
        streamruns,
        textops,
        tpch,
        udfs,
        windows,
    )

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod in (
        relational,
        tpch,
        advanced,
        windows,
        setops,
        events,
        graph,
        migration,
        compare,
        dedup,
        similarity,
        textops,
        multimodal,
        pipeline,
        udfs,
        streamruns,
    ):
        q = getattr(mod, "QUERIES", {})
        o = getattr(mod, "ORACLES", {})
        dup = set(q) & set(queries)
        if dup:
            raise ValueError(f"duplicate query names: {dup}")
        queries.update(q)
        oracles.update(o)

    missing = [n for n in VERIFY_PRIORITY if n not in queries]
    if missing:
        raise ValueError(f"VERIFY_PRIORITY names unknown queries: {missing}")
    ordered = {n: queries[n] for n in VERIFY_PRIORITY}
    ordered.update({n: f for n, f in queries.items() if n not in ordered})
    return ordered, oracles
