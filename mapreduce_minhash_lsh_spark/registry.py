"""Query registry: the driver-contract surface (__spark_entry__).

Every entry pairs a Spark DataFrame callable with a DuckDB oracle SQL
twin that computes the *identical* result — same seeded hash literals,
same column names, same (deterministic) value arithmetic.  Design rules
that make cross-engine value-hash equality hold:

  * integer arithmetic everywhere possible (ids, counts, epochs);
  * double outputs are either raw column pass-throughs, ratios of
    identical integers, or exact decimal sums cast to double — never
    order-dependent float accumulation;
  * every computed column aliased identically on both sides;
  * all randomness is seeded config literals embedded in both texts.
"""

from __future__ import annotations

# Machinery + the driver priority window (the first 50 of queries()).
from mapreduce_minhash_lsh_spark.queries._base import (  # noqa: F401
    PIPELINE_CFG,
    QueryFn,
    _ORACLES,
    _PRIORITY,
    _QUERIES,
    register,
)

# Family modules - importing them performs every registration.  The
# split (round 7, VERDICT r6 #7) is by family; _ORDER below freezes the
# pre-split registration order so queries()/oracle_sql() iterate exactly
# as before regardless of module layout.
from mapreduce_minhash_lsh_spark.queries import (  # noqa: E402, F401
    ann,
    events,
    llm,
    pipeline,
    quality,
    tpch,
)

_ORDER: list[str] = [
    "shingling",
    "shingle_postings",
    "vocabulary",
    "minhash_signatures",
    "lsh_bands",
    "candidate_pairs",
    "similar_pairs",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "q10_returned_revenue",
    "q18_large_orders",
    "orders_above_customer_avg",
    "window_top_orders_per_customer",
    "events_sessionize",
    "events_moving_avg",
    "events_funnel",
    "rollup_quantity",
    "events_json_extract",
    "streaming_events_hourly",
    "streaming_hourly_users",
    "streaming_view_clicks",
    "similar_groups",
    "text_stats",
    "lang_id",
    "doc_fingerprint",
    "quality_scores",
    "frequent_tokens",
    "dedup_by_lang_source",
    "dedup_drop_ids",
    "near_dup_groups",
    "near_dup_drop_ids",
    "cross_corpus_near_dups",
    "packed_sequences",
    "simhash",
    "oph_similar_pairs",
    "skew_similar_pairs",
    "weighted_similar_pairs",
    "containment_pairs_postings",
    "paragraph_near_dups",
    "ann_topk",
    "embedding_near_dup",
    "embeddings_rp_project",
    "documents_hash_sample",
    "train_valid_test_split",
    "redact_pii",
    "documents_profile",
    "purchases_with_last_view",
    "parts_price_bands",
    "multimodal_features",
    "candidate_pairs_split",
    "word_similar_pairs",
    "similar_pairs_symmetric",
    "distinct_parts_per_flag",
    "events_hourly",
    "event_type_shares",
    "exact_dedup_text",
    "ngram_jaccard_sample",
    "ann_lsh_topk",
    "simhash_near_pairs",
    "mllib_similar_pairs",
    "token_counts",
    "similar_topk",
    "q6_forecast_revenue",
    "customers_without_orders",
    "suppliers_with_lineitems",
    "partkeys_never_ordered",
    "orders_by_year_priority",
    "sql_interface",
    "customer_order_counts",
    "median_quantity",
    "normalized_dedup",
    "cube_quantity",
    "price_histogram",
    "nation_suppliers",
    "string_functions",
    "ann_ivf_topk",
    "ann_ivf_recall_floor",
    "repetition_scores",
    "benchmark_contamination",
    "word_bigram_jaccard_sample",
    "events_users_hll",
    "quantity_quantiles_approx",
    "stratified_sample",
    "quality_weighted_sample",
    "near_dup_drop_best_quality",
    "events_session_window",
    "embeddings_profile",
    "distinctive_terms",
    "lsh_recall_probe",
    "q4_late_shipment_priorities",
    "q12_priority_lines_by_flag",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "events_pivot_daily",
    "vocab_coverage",
    "q7_nation_trade_volume",
    "q13_customer_order_distribution",
    "q9_profit_by_nation_year",
    "q21_sole_blame_suppliers",
    "q19_disjunctive_revenue",
    "q22_idle_rich_customers",
    "customer_balance_ranks",
    "q8_market_share",
    "lang_rebalanced_sample",
    "packed_sequences_greedy",
    "document_chunks",
    "events_retention_cohorts",
    "events_trailing_hour_stats",
    "purchases_with_next_view",
    "concurrent_sessions",
    "containment_pairs",
    "quantity_price_correlation",
    "edit_distance_pairs",
    "events_sliding_windows",
    "quantity_grouping_sets",
    "token_length_histogram",
    "cheapest_supplier_per_part",
    "user_lifetime_profile",
    "user_first_last_event",
    "partkeys_both_years",
    "oph_signatures",
    "embedding_dedup_drop_ids",
    "near_dup_group_sizes",
    "events_debounce",
    "customer_rfm_segments",
    "events_hourly_anomalies",
    "incremental_similar_pairs",
]


def _ordered(mapping: dict) -> dict:
    missing = [n for n in _PRIORITY if n not in _QUERIES]
    if missing:
        raise KeyError(f"_PRIORITY names not registered: {missing}")
    out = {n: mapping[n] for n in _PRIORITY if n in mapping}
    for n in _ORDER:
        if n in mapping and n not in out:
            out[n] = mapping[n]
    out.update({n: v for n, v in mapping.items() if n not in out})
    return out


def queries() -> dict[str, QueryFn]:
    return _ordered(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return _ordered(_ORACLES)
