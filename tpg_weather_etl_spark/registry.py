"""Central query/oracle registry assembled from the gate modules."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tpg_weather_etl_spark import queries_relational

_MODULES = [queries_relational]
_IMPORT_FAILURES: list[str] = []

try:  # text/similarity gate lands after the relational core
    from tpg_weather_etl_spark import queries_text
    _MODULES.append(queries_text)
except ImportError:
    _IMPORT_FAILURES.append("queries_text")

try:
    from tpg_weather_etl_spark import queries_embeddings
    _MODULES.append(queries_embeddings)
except ImportError:
    _IMPORT_FAILURES.append("queries_embeddings")

try:
    from tpg_weather_etl_spark import queries_scalar
    _MODULES.append(queries_scalar)
except ImportError:
    _IMPORT_FAILURES.append("queries_scalar")

try:
    from tpg_weather_etl_spark import queries_ml
    _MODULES.append(queries_ml)
except ImportError:
    _IMPORT_FAILURES.append("queries_ml")

try:
    from tpg_weather_etl_spark import queries_multimodal
    _MODULES.append(queries_multimodal)
except ImportError:
    _IMPORT_FAILURES.append("queries_multimodal")


# The driver caps each round at 50 checked queries of the registry,
# walking it in order. ROUND-13 ROTATION (VERDICT r12 item 6): head =
# the r9-stale cohort (the 48 names whose latest driver row is r9 —
# the staged r13 head from the r12 rotation note) plus the 2 stalest
# of the r10 cohort (dup_span_regions, kn_bigram_logprob) to fill the
# 50-name cap exactly. After r13 no registry query's latest driver
# row is older than r10.
_RUN_FIRST = [
    "curation_e2e",
    "bitext_mining_pairs",
    "embedding_neardup_capped",
    "jl_topk",
    "numeric_profile",
    "source_priority_dedup",
    "domain_curation",
    "source_lang_entropy",
    "scd2_intervals",
    "weighted_sample_topk",
    "sliding_window_counts",
    "rank_functions",
    "fuzzy_match_sources",
    "embedding_zscore",
    "semantic_search",
    "daily_value_quantiles",
    "snapshot_diff",
    "null_safe_join",
    "array_hof_stats",
    "sql_api_revenue",
    "order_count_distribution",
    "big_orders",
    "small_quantity_revenue",
    "char_fingerprints",
    "vocab_ids",
    "tokenized_docs",
    "salted_join_revenue",
    "constraint_report",
    "json_extract",
    "gap_fill_forward",
    "pii_redact",
    "chunk_dedup",
    "sequence_pack",
    "multimodal_metadata",
    "embedding_neardup_multi",
    "repetition_stats",
    "unigram_logprob",
    "pipeline_funnel",
    "dedup_apply",
    "semantic_dedup_keeper",
    "semantic_dedup_apply",
    "bm25_topk",
    "dup_span_fraction",
    "dup_span_apply",
    "prefix_jaccard_pairs",
    "pagerank_parts",
    "degree_distribution",
    "zipf_slope",
    "dup_span_regions",
    "kn_bigram_logprob",
]

# Stalest-first after the head: the rest of the r10-refreshed block —
# staged as r14's natural head (with the freshest tail below filling
# the remaining cap slots).
_RUN_MID = [
    "minhash_pairs_capped",
    "deterministic_sample",
    "embedding_contamination",
    "basket_lift_pairs",
    "ngram_novelty",
    "nb_source_confusion",
    "event_transitions",
    "token_budget_sample",
    "train_test_split",
    "key_skew_profile",
    "source_quality_matrix",
    "approx_accuracy",
    "group_mad",
    "gap_fill_interpolate",
    "trend_by_type",
    "value_outliers",
    "fk_integrity",
    "cube_revenue",
    "disjunctive_pred_revenue",
    "idle_customer_balance",
    "promo_revenue",
    "volume_shipping",
    "market_share",
    "returned_items",
    "top_supplier",
    "priority_late_orders",
    "min_cost_supplier",
    "profit_by_nation_year",
    "important_parts",
    "supplier_cnt_by_type",
    "waiting_orders",
    "skyline_parts",
    "decile_stats",
    "shipping_priority",
    "local_supplier_volume",
    "forecast_revenue_change",
    "returnflag_priority_counts",
    "excess_suppliers",
    "unpivot_metrics",
    "activity_bitmask",
    "bitmap_distinct_users",
    "int8_quant_topk",
    "variant_extract",
    "lateral_top_items",
    "sequence_gaps",
    "revenue_share",
    "bpe_merges",
]

# Tail, stalest-first: the r11-refreshed block, then the 50 names
# refreshed in round 12 (freshest, last to win a cap slot).
_RUN_LAST = [
    "contamination_eval",
    "minhash_est_accuracy",
    "heavy_hitters",
    "source_kl_drift",
    "doc_chunks",
    "neardup_eval",
    "cluster_split",
    "bpe_encode",
    "bigram_logprob",
    "centroid_shift",
    "ann_recall_eval",
    "rrf_fusion",
    "dedup_rate_by_source",
    "winsorized_stats",
    "source_ks_drift",
    "chi2_source_lang",
    "token_gini",
    "lang_agreement",
    "cluster_size_histogram",
    "embedding_norm_profile",
    "rolling_7d",
    "sessionize",
    "interval_join",
    "pattern_within",
    "asof_join",
    "lag_grid",
    "pricing_summary",
    "top_orders",
    "region_revenue",
    "semi_join_parts",
    "anti_join_customers",
    "left_join_enrich",
    "dedupe_exact",
    "dedupe_priority",
    "group_median",
    "agg_by_bin",
    "latest_per_user",
    "scalar_bins",
    "time_features",
    "text_stats",
    "lang_quality",
    "fingerprint_dedup",
    "simhash",
    "simhash_pairs",
    "contamination_ngrams",
    "stratified_sample",
    "length_buckets",
    "gopher_quality",
    "source_mix_weights",
    "part_triangles",
    "clustering_coeff",
    "edge_jaccard",
    "mixed_sample",
    "embedding_topk",
    "ann_buckets",
    "ann_topk",
    "embedding_neardup",
    "ivf_topk",
    "scalar_normalize",
    "heatmap_hour_dow",
    "kpi_summary",
    "cohort_retention",
    "funnel_steps",
    "tfidf_top_terms",
    "bigram_topk",
    "dominant_event_type",
    "distinct_months",
    "minmax_bounds",
    "null_profile",
    "topk_latest",
    "contains_filter",
    "union_shards",
    "pq_topk",
    "dsir_importance",
    "quality_filter_funnel",
    "temperature_mix_weights",
    "boilerplate_prefixes",
    "char_entropy",
    "source_overlap_jaccard",
    "contrastive_triplets",
    "pack_efficiency",
    "perplexity_filter_apply",
    "ngram_coverage_curve",
    "containment_pairs",
    "dedup_keeper",
    "minhash_pairs",
    "dedup_clusters",
    "kmeans_ivf_topk",
    "ngram_jaccard_pairs",
    "label_centroids",
    "embedding_dedup_clusters",
    "multimodal_features",
    "rollup_revenue",
    "pivot_event_values",
    "intersect_except",
    "array_agg_types",
    "approx_stats",
    "session_window_agg",
    "bpe_token_stats",
]


def _validate_ordering(query_keys: set[str]) -> None:
    # A typo in the hand-maintained ordering lists would silently land
    # a query in the unordered middle — fail loudly instead. Validated
    # against the QUERY key set (oracles are a subset: no-oracle
    # queries get a rows-only check and have no ORACLE entry). Only
    # enforced when every gate module imported: with a module missing,
    # its names are legitimately absent and a hard assert would turn
    # that partial degradation into total registry failure.
    # raise, not assert: `python -O` strips asserts and a typo here
    # would silently demote a query to the unordered middle.
    if not _IMPORT_FAILURES:
        unknown = (set(_RUN_FIRST) | set(_RUN_MID) | set(_RUN_LAST)
                   ) - query_keys
        if unknown:
            raise ValueError(
                f"registry ordering names unknown queries: {unknown}")
    for a, b in (("_RUN_FIRST", "_RUN_MID"), ("_RUN_FIRST", "_RUN_LAST"),
                 ("_RUN_MID", "_RUN_LAST")):
        dup = set(globals()[a]) & set(globals()[b])
        if dup:
            raise ValueError(f"queries listed in both {a} and {b}: {dup}")


def _prioritize(d: dict) -> dict:
    head = {k: d[k] for k in _RUN_FIRST if k in d}
    head.update({k: d[k] for k in _RUN_MID if k in d})
    head.update({k: v for k, v in d.items()
                 if k not in head and k not in _RUN_LAST})
    head.update({k: d[k] for k in _RUN_LAST if k in d})
    return head


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    _validate_ordering(set(out))
    return _prioritize(out)


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
        # data-derived oracles (e.g. fitted kmeans centers inlined as
        # literals) are built at call time, not import time
        for name, build in getattr(m, "ORACLE_DYNAMIC", {}).items():
            out[name] = build()
    return _prioritize(out)
