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


# The driver caps each round at 50 checked queries of the 100-query
# registry, walking it in order. Rotate per round so every query's
# latest green row is ≤1 round old: round 4 checked the then-head 50,
# so round 5 fronts the other half — led by containment_pairs and
# dedup_keeper (added in r4, never driver-checked) and the r3-green
# tail. The 50 queries green in CORRECTNESS_r04 go to the tail.
_RUN_FIRST = [
    # added in round 4 — zero driver evidence in any round yet
    "containment_pairs",
    "dedup_keeper",
    # last driver-green row is round 3
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
]

# Green in round 4 (CORRECTNESS_r04) — the least-information rows to
# lose to the 50-query cap.
_RUN_LAST = [
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
    "deterministic_sample",
    "contains_filter",
    "union_shards",
    # new in round 5 — behind the 50-query rotation head on purpose
    # (the head must finish covering the r4-unchecked half first);
    # pytest gate-parity + tools/check_oracle.py provide their
    # round-5 evidence, and the round-6 rotation fronts them.
    # ROUND-6 ROTATION PLAN: front every name from here down (the
    # round-5 additions, no driver row yet), then fill the head to 50
    # with the oldest r4-green names above; push the r5-driver-checked
    # _RUN_FIRST block to the tail.
    "dedup_apply",
    "semantic_dedup_keeper",
    "volume_shipping",
    "market_share",
    "returned_items",
    "top_supplier",
    "priority_late_orders",
    "token_budget_sample",
    "key_skew_profile",
    "unpivot_metrics",
    "activity_bitmask",
    "bitmap_distinct_users",
    "min_cost_supplier",
    "profit_by_nation_year",
    "important_parts",
    "supplier_cnt_by_type",
    "waiting_orders",
    "skyline_parts",
    "decile_stats",
    "part_triangles",
    "int8_quant_topk",
    "pagerank_parts",
    "degree_distribution",
    "zipf_slope",
    "basket_lift_pairs",
    "fk_integrity",
    "value_outliers",
    "train_test_split",
    "shipping_priority",
    "local_supplier_volume",
    "forecast_revenue_change",
    "returnflag_priority_counts",
    "excess_suppliers",
    "ngram_novelty",
    "variant_extract",
    "event_transitions",
    "nb_source_confusion",
    "lateral_top_items",
    "sequence_gaps",
    "revenue_share",
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
        unknown = (set(_RUN_FIRST) | set(_RUN_LAST)) - query_keys
        if unknown:
            raise ValueError(
                f"registry ordering names unknown queries: {unknown}")
    dup = set(_RUN_FIRST) & set(_RUN_LAST)
    if dup:
        raise ValueError(
            f"queries listed in both _RUN_FIRST and _RUN_LAST: {dup}")


def _prioritize(d: dict) -> dict:
    head = {k: d[k] for k in _RUN_FIRST if k in d}
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
