"""Misra-Gries heavy hitters: exactness guarantee and bounded
candidate volume under an adversarial split + long tail."""

from __future__ import annotations

from pyspark.sql import functions as F

from tpg_weather_etl_spark.operators.heavy import (
    heavy_hitters,
    mg_candidates,
)


def _corpus(spark):
    # one true heavy value scattered evenly across ALL partitions
    # (the per-partition count is far below the global one — the
    # pigeonhole argument, not per-partition dominance, must carry
    # it), one borderline value, and a 5000-value long tail.
    hot = spark.range(1200).select(F.lit("hot").alias("v"))
    warm = spark.range(140).select(F.lit("warm").alias("v"))
    tail = spark.range(10000).select(
        F.concat(F.lit("t"), (F.col("id") % 5000).cast("string")).alias("v"))
    return hot.union(warm).union(tail).repartition(16)


def test_exact_vs_full_groupby(spark):
    df = _corpus(spark)
    k = 50  # threshold N/k = 11340/50 = 226.8
    got = {(r.value, r.cnt) for r in heavy_hitters(df, "v", k).collect()}
    n = df.count()
    want = {(r.v, r.c) for r in
            df.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") * k > n).collect()}
    assert got == want == {("hot", 1200)}


def test_borderline_included_when_over_threshold(spark):
    df = _corpus(spark)
    k = 75  # threshold 151.2: hot and... warm=140 still below
    got = {r.value for r in heavy_hitters(df, "v", k).collect()}
    assert got == {"hot"}
    k = 100  # threshold 113.4: warm=140 now qualifies
    got = {(r.value, r.cnt) for r in heavy_hitters(df, "v", k).collect()}
    assert got == {("hot", 1200), ("warm", 140)}


def test_candidate_volume_bounded(spark):
    df = _corpus(spark)
    k = 50
    n_cand = mg_candidates(df, "v", k).count()
    n_parts = df.rdd.getNumPartitions()
    assert n_cand <= n_parts * k
    # and the candidates are a tiny fraction of the 5002-value domain
    assert n_cand < df.select("v").distinct().count() / 3
