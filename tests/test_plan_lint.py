"""Registry-wide physical-plan lint — the 100 TB design bar, enforced
mechanically: every gate query's plan is built (analysis + physical
planning only, nothing executes) and checked for the two classic
scale-killers.

- CartesianProduct: never acceptable.
- BroadcastNestedLoopJoin: only where a bounded tiny side makes it the
  intended plan (allowlisted with the reason).

A new query that accidentally introduces an unbounded nested loop
fails this suite immediately instead of surviving until someone reads
its plan by hand.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

# query → why a nested-loop there is the *intended* plan
BNLJ_ALLOWED = {
    # brute-force cosine baseline: 10 query vectors broadcast on
    # purpose (the ANN variants are the scale path)
    "embedding_topk": "10-row query side, deliberate baseline",
    # JL compressed scan: same bounded 10-query broadcast, but over
    # the 16-double projection column (4x less scan bandwidth)
    "jl_topk": "10-row query side over the compressed column",
    # levenshtein dictionary self-join: ~20 distinct sources
    "fuzzy_match_sources": "distinct key vocabulary, bounded",
    # IVF centroid assignment: corpus × broadcast fixed-k centroid
    # table (BuildRight = centroids; distance-to-all-k is the point)
    "ivf_topk": "fixed-k centroid broadcast",
    "kmeans_ivf_topk": "fixed-k centroid broadcast",
    "semantic_dedup_keeper": "fixed-k centroid broadcast",
    "semantic_dedup_apply": "fixed-k centroid broadcast",
    # source-mix weighting: per-source stats × single-row global total
    "source_mix_weights": "single-row global total broadcast",
    "mixed_sample": "single-row global total broadcast",
    # Q22 shape: single-row average-balance threshold broadcast
    "idle_customer_balance": "single-row scalar threshold broadcast",
    # skew report: k-row top set × single-row (total, n_keys) broadcast
    "key_skew_profile": "single-row global total broadcast",
    # Q11 shape: single-row grand-total threshold broadcast
    "important_parts": "single-row scalar threshold broadcast",
    # decile boundaries: single-row n + single-row 9-boundary broadcast
    "decile_stats": "single-row boundary/total broadcasts",
    # integrity report: seven (1-row totals × 1-row orphans) pairings
    "fk_integrity": "1-row x 1-row per-relationship report rows",
    # lift: single-row n_orders broadcast onto the pair table
    "basket_lift_pairs": "single-row global total broadcast",
    # MG heavy hitters: candidate recount × single-row corpus total
    "heavy_hitters": "single-row global total broadcast",
    # KL drift: ~20-source dictionary × top-50 vocab grid + 1-row total
    "source_kl_drift": "bounded dictionary x top-T grid",
    # detector self-eval: four 1-row count aggregates crossed into the
    # single report row
    "neardup_eval": "1-row x 1-row report aggregates",
    # bigram LM: 1-row vocabulary-size scalar broadcast
    "bigram_logprob": "single-row scalar V broadcast",
    "kn_bigram_logprob": "single-row scalar B (distinct-bigram count) "
                         "broadcast",
    # KS drift: ~20-source dictionary × distinct-length grid + 1-row N
    "source_ks_drift": "bounded dictionary x distinct-values grid",
    # chi2 audit: |sources|×|langs| dictionary grid + 1-row N/total
    "chi2_source_lang": "bounded dictionary grid + scalar broadcasts",
    # recall eval composes the deliberate brute-force baseline
    # (10-row query side) with the bucketed ANN
    "ann_recall_eval": "10-row query side, deliberate baseline",
    # decontamination self-eval: capped-sample brute-force baseline
    # (both sides <= CONTAM_EVAL_MAX rows by construction) + five
    # 1-row count aggregates crossed into the single report row
    "contamination_eval": "capped-sample brute force + 1-row report "
                          "aggregates",
    # fusion composes ivf_topk (fixed-k centroid broadcast) + ann_topk
    "rrf_fusion": "fixed-k centroid broadcast",
    # SQ8: 1-row quantizer params + <=3-row query codes broadcast
    # (the != self-pair filter makes the equi-less probe a BNLJ on
    # purpose — same deliberate baseline as embedding_topk)
    "int8_quant_topk": "dims-bounded params + query-side broadcast",
    # triangle report: 1-row n_edges × 1-row n_triangles
    "part_triangles": "1-row x 1-row final report join",
    # NB model grid: vocab × S-source totals (bounded by the vocab
    # count-floor) plus two 1-row scalars (V, corpus size)
    "nb_source_confusion": "count-floor-bounded model grid broadcast",
    # DSIR: single-row (n_all, n_tgt) total crossed into the
    # DSIR_BUCKETS-bounded bucket table
    "dsir_importance": "single-row global total broadcast",
    # temperature mixing: per-source stats × 1-row total × 1-row Z
    "temperature_mix_weights": "single-row global total broadcast",
    # PQ: corpus × 128-row codebook (distance-to-all-codes is the
    # encode step, same shape as the fixed-k centroid assignment)
    "pq_topk": "bounded 128-row codebook broadcast",
    # triplets compose the deliberate brute-force baseline
    "contrastive_triplets": "10-row query side, deliberate baseline",
    # perplexity cut: composes bigram_logprob's 1-row V scalar plus
    # its own 1-row quantile-threshold broadcast
    "perplexity_filter_apply": "single-row scalar threshold broadcast",
    # coverage curve: rank<=k inequality join against the 4-row
    # constant k table + 1-row totals
    "ngram_coverage_curve": "constant k-table + 1-row total broadcast",
}


def _names():
    from tpg_weather_etl_spark.registry import all_queries
    return sorted(all_queries())


@pytest.mark.parametrize("name", _names())
def test_no_unbounded_nested_loop(spark, name):
    from tpg_weather_etl_spark.registry import all_queries

    df = all_queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian join\n{plan}"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: nested-loop join outside the allowlist\n{plan}"
        )


def _plan(spark, name: str) -> str:
    from tpg_weather_etl_spark.registry import all_queries
    return (all_queries()[name](spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())


def test_disjunctive_pred_pushes_implied_conjuncts(spark):
    """Q19 shape: the per-side implied conjuncts must reach the scans
    (brand IN-list on part, quantity range on lineitem) and the dim
    side must broadcast — the residual OR-of-ANDs evaluates post-join."""
    plan = _plan(spark, "disjunctive_pred_revenue")
    assert "BroadcastHashJoin" in plan
    assert "p_brand" in plan.split("BroadcastExchange")[-1]
    # lineitem scan carries the pushed quantity range
    li_scan = next(l for l in plan.splitlines()
                   if "FileScan" in l and "lineitem" in l)
    assert "l_quantity" in li_scan


def test_bm25_single_corpus_materialization(spark):
    """The shared (doc, term-bucket) aggregate must serve every branch
    from cache — the corpus explode materializes once, not per branch."""
    plan = _plan(spark, "bm25_topk")
    assert plan.count("InMemoryTableScan") >= 2


def test_trend_by_type_is_one_shuffle(spark):
    """Grouped OLS = one hash-agg pass: a single shuffle Exchange (the
    event_type groupBy); the closed form is pure projection above it."""
    plan = _plan(spark, "trend_by_type")
    import re
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_cube_revenue_is_one_expand_one_agg(spark):
    """CUBE compiles to one Expand feeding one aggregate — never a
    re-scan per grouping level."""
    plan = _plan(spark, "cube_revenue")
    assert plan.count("Expand") == 1
    assert plan.count("FileScan") == 1


def test_runtime_bloom_filter_fires_on_selective_dim_join(spark):
    """Spark's InjectRuntimeFilter builds a bloom filter from the
    selective dim side and applies might_contain on the fact scan —
    rows that cannot join die before the shuffle. At 100 TB the fact
    side clears the 10GB applicationSideScanSizeThreshold naturally;
    the test lowers it (and disables broadcast, since runtime filters
    target shuffle joins) to pin that the rule fires on this join
    shape at test scale."""
    from pyspark.sql import functions as F

    from tpg_weather_etl_spark.sources.tables import read_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k in confs:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None          # unset (e.g. adaptive threshold)
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        l = read_table(spark, SF_DIR, "lineitem")
        p = read_table(spark, SF_DIR, "part").filter(
            F.col("p_brand") == "Brand#12")
        j = (l.join(p, l.l_partkey == p.p_partkey)
             .groupBy("p_brand").agg(F.count(F.lit(1)).alias("n")))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
