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
    # levenshtein dictionary self-join: ~20 distinct sources
    "fuzzy_match_sources": "distinct key vocabulary, bounded",
    # IVF centroid assignment: corpus × broadcast fixed-k centroid
    # table (BuildRight = centroids; distance-to-all-k is the point)
    "ivf_topk": "fixed-k centroid broadcast",
    "kmeans_ivf_topk": "fixed-k centroid broadcast",
    "semantic_dedup_keeper": "fixed-k centroid broadcast",
    # source-mix weighting: per-source stats × single-row global total
    "source_mix_weights": "single-row global total broadcast",
    "mixed_sample": "single-row global total broadcast",
    # Q22 shape: single-row average-balance threshold broadcast
    "idle_customer_balance": "single-row scalar threshold broadcast",
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
