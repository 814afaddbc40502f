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


# The driver caps each round at 50 checked queries of the 98-query
# registry, walking it in order. Rotate per round so every query's
# latest green row is ≤1 round old: rounds 2 and 3 both checked the
# same 50 (first-half), so round 4 fronts the 48 queries whose last
# evidence is round 1, plus the two round-3 `err` rows (interval_join,
# pattern_within — the NTZ regression, fixed this round) — exactly 50.
# r3-green queries go to the tail.
_RUN_FIRST = [
    # fixed this round (TIMESTAMP_NTZ regression) — must get fresh rows
    "rolling_7d",
    "sessionize",
    "interval_join",
    "pattern_within",
    # same unix_micros pattern, previously masked — re-prove under NTZ
    "asof_join",
    "lag_grid",
    # last green row is round 1
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
]

# Green in round 3 — the least-information rows to lose to the cap.
_RUN_LAST = [
    "label_centroids",
    "dedup_clusters",
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
    "kmeans_ivf_topk",
    "repetition_stats",
    "unigram_logprob",
    "pipeline_funnel",
    "ngram_jaccard_pairs",
    "minhash_pairs",
    # new this round — behind the 50-query rotation head on purpose:
    # pytest + tools/check_oracle.py provide their round-4 evidence
    "containment_pairs",
    "dedup_keeper",
]


def _validate_ordering(query_keys: set[str]) -> None:
    # A typo in the hand-maintained ordering lists would silently land
    # a query in the unordered middle — fail loudly instead. Validated
    # against the QUERY key set (oracles are a subset: no-oracle
    # queries get a rows-only check and have no ORACLE entry). Only
    # enforced when every gate module imported: with a module missing,
    # its names are legitimately absent and a hard assert would turn
    # that partial degradation into total registry failure.
    if not _IMPORT_FAILURES:
        unknown = (set(_RUN_FIRST) | set(_RUN_LAST)) - query_keys
        assert not unknown, \
            f"registry ordering names unknown queries: {unknown}"
    dup = set(_RUN_FIRST) & set(_RUN_LAST)
    assert not dup, f"queries listed in both _RUN_FIRST and _RUN_LAST: {dup}"


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
    return _prioritize(out)
