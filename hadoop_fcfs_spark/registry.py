"""Central query registry: the correctness-gate inventory.

Each entry pairs a Spark DataFrame builder with an equivalent ANSI-SQL
oracle string (run by DuckDB over the same parquet tables). Column names
are aliased identically on both sides — the driver's comparator sorts
columns by name and hashes values, so names must match exactly.

Floating-point aggregates are rounded identically on both sides (sums of
doubles accumulate in engine-specific order; rounding to a few decimals
makes the hash comparison robust while still catching real bugs).

The queries exercise the operator inventory of SURVEY.md §2; each
QuerySpec docstring cites the reference operator it proves parity with.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            # a silent overwrite would drop a gate from the driver's
            # correctness sweep without any test failing
            raise ValueError(f"duplicate gate name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc)
        return fn

    return deco


# ROUND-6 REBUILD PROCEDURE (do this FIRST next round, before adding
# gates): fold CORRECTNESS_r05's green names into _DRIVER_CONFIRMED_ROUND
# with value 5, move any _NEVER_SAMPLED entries that got r5 rows out of
# that tuple, and promote the still-unsampled remainder plus every gate
# registered during round 5 (bucket 1 today — they sort after the 52 and
# will mostly miss the r5 window) to the head of the new ordering. The
# r4 lesson: an unrebuilt prefix re-samples already-confirmed gates and
# the new ones never get hard driver evidence.
#
# Driver-sampling order (rebuilt for round 5, per VERDICT r4 item #1).
#
# The driver verifies a ~50-entry PREFIX of all_queries() per round, so the
# ordering below is the round's evidence budget. State after round 4:
# 211 registered gates, 159 with a fully-green driver CORRECTNESS row
# (rows+schema+hash — union of CORRECTNESS_r01..r04, every gate green in its
# latest sampling), and 52 late-r4 additions that have NEVER received a
# driver row. Those 52 fill the round-5 window, ordered so the four gates
# that already missed the r4 window (`event_transitions`, `trade_triangles`,
# `prefiltered_revenue`, `copurchase_lift`) cannot slip a third round, then
# oldest-registered-first; ~2 spill to round 6.

_NEVER_SAMPLED: tuple[str, ...] = (
    "event_transitions", "trade_triangles", "prefiltered_revenue",
    "copurchase_lift", "pareto_orders", "ewma_daily_events",
    "theil_sen_trend", "chi2_source_lang", "ab_test_conversion",
    "psi_price_drift", "kaplan_meier_retention", "rolling_wau",
    "benford_price_audit", "spearman_qty_price", "weighted_median_price",
    "new_vs_returning_daily", "event_seasonality", "qty_price_histogram2d",
    "cohort_ltv_curve", "user_behavior_entropy", "shipping_lead_time",
    "footer_table_stats", "dsir_selection", "bpe_pair_counts",
    "knn_label_confusion", "hybrid_rank_fusion", "script_profile",
    "tfidf_cosine_topk", "vocab_richness", "kcenter_coreset",
    "corpus_pipeline_v4", "term_dictionary", "negative_table_draws",
    "dup_family_histogram", "embedding_norm_qa", "langid_confusion",
    "frequent_brand_triples", "lpa_communities", "trending_parts",
    "concept_communities", "rfm_segments", "purchase_attribution",
    "trade_degree_assortativity", "gini_order_values", "lorenz_deciles",
    "hhi_supplier_concentration", "repeat_order_intervals",
    "top_nations_with_other", "dead_stock_audit", "session_path_topk",
    "debounce_events", "linear_attribution",
)

_DRIVER_CONFIRMED_ROUND: dict[str, int] = {
    # latest driver row: round 1 (11 gates)
    "agg_descriptors": 1, "asof_join": 1, "cube_agg": 1, "fieldsel": 1,
    "grep_count": 1, "keyfield_sort": 1, "monte_carlo_pi": 1, "pivot_agg": 1,
    "set_except": 1, "sorted_group_apply": 1, "union_distinct": 1,
    # latest driver row: round 2 (48 gates)
    "ann_cosine_pairs": 2, "ann_cosine_topk": 2, "ann_ivf_topk": 2,
    "char_entropy": 2, "chunk_documents": 2, "contamination_check": 2,
    "corpus_pipeline": 2, "dedup_clusters": 2, "dedup_exact": 2,
    "dedup_minhash_lsh": 2, "dedup_ngram_jaccard": 2,
    "embedding_near_dup": 2, "fingerprint": 2, "interval_sample": 2,
    "join_anti": 2, "join_full_outer": 2, "join_inner_agg": 2,
    "join_multiway": 2, "join_override": 2, "join_semi": 2,
    "json_extract_agg": 2, "kv_split": 2, "lang_id": 2,
    "multimodal_pipeline": 2, "near_dedup_clustered": 2,
    "near_dedup_corpus": 2, "pii_scrub": 2, "pricing_summary": 2,
    "quality_score": 2, "quantile_summary": 2, "repetition_signals": 2,
    "rollup_agg": 2, "secondary_sort": 2, "sequence_packing": 2,
    "set_intersect": 2, "text_normalize": 2, "tf_idf": 2, "token_counts": 2,
    "topk_orders": 2, "uniq_capped": 2, "value_histogram": 2,
    "window_analytics": 2, "window_range_frame": 2, "window_rank_family": 2,
    "winnow_fingerprint_stats": 2, "word_stats": 2, "wordcount": 2,
    "xml_records": 2,
    # latest driver row: round 3 (50 gates)
    "ann_rp_lsh_topk": 3, "approx_quantile_bounds": 3, "bbp_pi": 3,
    "boilerplate_removal": 3, "cohort_retention": 3, "concurrent_events": 3,
    "corpus_drift": 3, "corpus_pipeline_v2": 3, "dbcount_pageview": 3,
    "dedup_incremental": 3, "dedup_simhash": 3, "duplicate_span_stats": 3,
    "duplicate_spans": 3, "event_funnel": 3, "event_interval_join": 3,
    "fuzzy_term_join": 3, "grep_top": 3, "grouped_topk": 3,
    "grouping_sets_agg": 3, "hash_sample_orders": 3,
    "hll_distinct_rollup": 3, "inactive_rich_customers": 3,
    "large_volume_customer": 3, "lm_perplexity": 3,
    "local_supplier_volume": 3, "nation_value_share": 3, "nqueens": 3,
    "order_priority_exists": 3, "pagerank_nations": 3,
    "per_group_sample_orders": 3, "profile_orders": 3, "quantile_buckets": 3,
    "range_join": 3, "returned_items_topk": 3, "scd2_user_status": 3,
    "semdedup": 3, "session_window": 3, "sessionize": 3, "set_ops_bag": 3,
    "shipping_priority": 3, "side_data_lookup": 3, "skew_salted_join": 3,
    "sliding_window": 3, "stratified_sample_orders": 3,
    "supplier_part_counts": 3, "token_budget_mix": 3,
    "train_holdout_split": 3, "tumbling_window": 3, "vocab_stats": 3,
    "zorder_values": 3,
    # latest driver row: round 4 (50 gates)
    "ann_ivf_pq_topk": 4, "ann_pq_adc_topk": 4, "bfs_trade_reach": 4,
    "bm25_retrieval": 4, "centroid_separation": 4, "cms_heavy_hitters": 4,
    "cms_join_size": 4, "containment_dedup": 4, "contrastive_negatives": 4,
    "corpus_pipeline_v3": 4, "corpus_report": 4,
    "cross_source_duplication": 4, "customer_distribution": 4,
    "daily_event_anomaly": 4, "data_validation": 4,
    "disjunctive_filter_revenue": 4, "duplicate_safe_split": 4,
    "embedding_gram": 4, "excess_volume_suppliers": 4, "forecast_revenue": 4,
    "gap_fill_hourly": 4, "inverted_index": 4, "jaccard_prefix_dedup": 4,
    "key_skew_report": 4, "kll_quantile_rollup": 4, "kn_bigram_model": 4,
    "late_lines_priority": 4, "latest_event_per_user": 4, "lineitem_corr": 4,
    "mad_event_anomaly": 4, "merge_upsert_customers": 4,
    "merged_user_coverage": 4, "min_acctbal_supplier": 4,
    "national_market_share": 4, "orders_mutual_info": 4,
    "product_type_profit": 4, "promo_revenue_ratio": 4, "skew_salted_agg": 4,
    "small_quantity_revenue": 4, "snapshot_diff_orders": 4,
    "terasort_validate": 4, "theta_user_overlap": 4,
    "token_budget_mix_weighted": 4, "top_supplier": 4, "volume_shipping": 4,
    "volume_trend": 4, "waiting_suppliers": 4, "weighted_sample_orders": 4,
    "winsorize_events": 4, "word_cooccurrence": 4,
}



def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules that register queries.
    from hadoop_fcfs_spark import queries_agg  # noqa: F401
    from hadoop_fcfs_spark import queries_io  # noqa: F401
    from hadoop_fcfs_spark import queries_llm  # noqa: F401
    from hadoop_fcfs_spark import queries_relational  # noqa: F401
    from hadoop_fcfs_spark import queries_streaming  # noqa: F401

    # r5 ordering: (0) the 52 gates with no driver row across r01-r04,
    # explicitly ordered; (1) anything registered after this table was
    # built (new this round) in registration order; (2) confirmed gates,
    # oldest-latest-round first (re-validation value), name-tiebroken;
    # (3) rows-only gates last (weak check, never worth a sampled slot).
    never_rank = {name: i for i, name in enumerate(_NEVER_SAMPLED)}
    reg_rank = {name: i for i, name in enumerate(_REGISTRY)}

    def bucket(spec: QuerySpec) -> tuple:
        if spec.oracle is None:
            return (3, 0, spec.name)
        if spec.name in never_rank:
            return (0, never_rank[spec.name], spec.name)
        if spec.name not in _DRIVER_CONFIRMED_ROUND:
            return (1, reg_rank[spec.name], spec.name)
        return (2, _DRIVER_CONFIRMED_ROUND[spec.name], spec.name)

    ordered = sorted(_REGISTRY.values(), key=bucket)
    return {s.name: s for s in ordered}
