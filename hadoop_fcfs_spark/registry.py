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


# Gates with a driver-confirmed fully-green CORRECTNESS row (rows+schema+
# hash) — the union of CORRECTNESS_r01..r03 (109 names, every one green in
# its latest sampling). The driver verifies a ~50-entry PREFIX of this
# inventory per round, so all_queries() orders gates that still LACK a hard
# driver row first — newly added or never-sampled ones — then this
# confirmed tail (oldest-confirmed first, for re-validation).
_DRIVER_CONFIRMED: frozenset[str] = frozenset({
    "agg_descriptors", "ann_cosine_pairs", "ann_cosine_topk", "ann_ivf_topk",
    "ann_rp_lsh_topk", "approx_quantile_bounds", "asof_join", "bbp_pi",
    "boilerplate_removal", "char_entropy", "chunk_documents",
    "cohort_retention", "concurrent_events", "contamination_check",
    "corpus_drift", "corpus_pipeline", "corpus_pipeline_v2", "cube_agg",
    "dbcount_pageview", "dedup_clusters", "dedup_exact", "dedup_incremental",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
    "duplicate_span_stats", "duplicate_spans", "embedding_near_dup",
    "event_funnel", "event_interval_join", "fieldsel", "fingerprint",
    "fuzzy_term_join", "grep_count", "grep_top", "grouped_topk",
    "grouping_sets_agg", "hash_sample_orders", "hll_distinct_rollup",
    "inactive_rich_customers", "interval_sample", "join_anti",
    "join_full_outer", "join_inner_agg", "join_multiway", "join_override",
    "join_semi", "json_extract_agg", "keyfield_sort", "kv_split", "lang_id",
    "large_volume_customer", "lm_perplexity", "local_supplier_volume",
    "monte_carlo_pi", "multimodal_pipeline", "nation_value_share",
    "near_dedup_clustered", "near_dedup_corpus", "nqueens",
    "order_priority_exists", "pagerank_nations", "per_group_sample_orders",
    "pii_scrub", "pivot_agg", "pricing_summary", "profile_orders",
    "quality_score", "quantile_buckets", "quantile_summary", "range_join",
    "repetition_signals", "returned_items_topk", "rollup_agg",
    "scd2_user_status", "secondary_sort", "semdedup", "sequence_packing",
    "session_window", "sessionize", "set_except", "set_intersect",
    "set_ops_bag", "shipping_priority", "side_data_lookup",
    "skew_salted_join", "sliding_window", "sorted_group_apply",
    "stratified_sample_orders", "supplier_part_counts", "text_normalize",
    "tf_idf", "token_budget_mix", "token_counts", "topk_orders",
    "train_holdout_split", "tumbling_window", "union_distinct",
    "uniq_capped", "value_histogram", "vocab_stats", "window_analytics",
    "window_range_frame", "window_rank_family", "winnow_fingerprint_stats",
    "word_stats", "wordcount", "xml_records", "zorder_values",
})

# Confirmed gates whose LATEST driver row is oldest (round 1) — when the
# sampling prefix has slots left after the unconfirmed gates, these are the
# most valuable re-validations.
_CONFIRMED_R1_ONLY: tuple[str, ...] = (
    "agg_descriptors", "asof_join", "cube_agg", "fieldsel", "grep_count",
    "keyfield_sort", "monte_carlo_pi", "pivot_agg", "set_except",
    "sorted_group_apply", "union_distinct",
)


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules that register queries.
    from hadoop_fcfs_spark import queries_agg  # noqa: F401
    from hadoop_fcfs_spark import queries_io  # noqa: F401
    from hadoop_fcfs_spark import queries_llm  # noqa: F401
    from hadoop_fcfs_spark import queries_relational  # noqa: F401
    from hadoop_fcfs_spark import queries_streaming  # noqa: F401

    # r4 ordering: the 17 gates that have never received a driver
    # CORRECTNESS row across r01-r03 go first (VERDICT r3 item #1), then
    # any gate added this round (not in _DRIVER_CONFIRMED), then the 11
    # confirmed gates whose latest row is from round 1 (re-validation),
    # then the rest of the confirmed tail. terasort_validate is now
    # value-oracled (deterministic verdict row) so it earns a prefix slot.
    priority = {
        name: i
        for i, name in enumerate((
            "promo_revenue_ratio", "disjunctive_filter_revenue",
            "small_quantity_revenue", "forecast_revenue", "volume_shipping",
            "national_market_share", "product_type_profit",
            "late_lines_priority", "customer_distribution", "top_supplier",
            "waiting_suppliers", "min_acctbal_supplier",
            "excess_volume_suppliers", "skew_salted_agg",
            "latest_event_per_user", "data_validation", "terasort_validate",
        ))
    }
    revalidate = {name: i for i, name in enumerate(_CONFIRMED_R1_ONLY)}
    # unconfirmed gates from the r4 2026-08-13 sessions: they have
    # waited a full driver round for a hard row, so they outrank the
    # (more numerous) later-session additions inside the unconfirmed
    # bucket — otherwise module registration order could crowd them out
    # of the ~50-slot sampling window.
    r4_early = {
        name: i
        for i, name in enumerate((
            "kll_quantile_rollup", "theta_user_overlap", "daily_event_anomaly",
            "lineitem_corr", "orders_mutual_info", "winsorize_events",
            "gap_fill_hourly", "volume_trend", "inverted_index",
            "word_cooccurrence", "cms_heavy_hitters", "merged_user_coverage",
            "key_skew_report", "mad_event_anomaly", "cms_join_size",
            "weighted_sample_orders", "duplicate_safe_split",
            "token_budget_mix_weighted", "bm25_retrieval", "containment_dedup",
            "corpus_report", "cross_source_duplication", "corpus_pipeline_v3",
            "centroid_separation", "ann_pq_adc_topk", "ann_ivf_pq_topk",
            "kn_bigram_model", "contrastive_negatives", "embedding_gram",
            "jaccard_prefix_dedup", "merge_upsert_customers", "bfs_trade_reach",
            "snapshot_diff_orders", "event_transitions", "trade_triangles",
            "prefiltered_revenue", "copurchase_lift",
        ))
    }

    def bucket(spec: QuerySpec) -> tuple[int, int]:
        if spec.name in priority:
            return (0, priority[spec.name])
        if spec.oracle is None:
            return (5, 0)  # rows-only: weak check, never worth a sampled slot
        if spec.name not in _DRIVER_CONFIRMED:
            if spec.name in r4_early:
                return (1, r4_early[spec.name])  # waited longest
            return (2, 0)  # new this session
        if spec.name in revalidate:
            return (3, revalidate[spec.name])
        return (4, 0)

    ordered = sorted(_REGISTRY.values(), key=lambda s: bucket(s))  # stable within buckets
    return {s.name: s for s in ordered}
