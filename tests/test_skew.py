"""salted_join / count_distinct_skew_safe equal their naive forms on a
synthetically skewed dataset (one key holding 90% of rows)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _skewed(spark):
    hot = spark.range(900).select(
        F.lit("HOT").alias("k"), F.col("id").alias("v"))
    cold = spark.range(100).select(
        F.concat(F.lit("k"), (F.col("id") % 20).cast("string")).alias("k"),
        F.col("id").alias("v"))
    return hot.union(cold)


def test_salted_join_matches_plain_join(spark):
    from tpg_weather_etl_spark.operators.skew import salted_join

    left = _skewed(spark)
    right = spark.createDataFrame(
        [("HOT", 1.0), ("k3", 2.0), ("k7", 3.0), ("missing", 9.9)],
        ["k", "w"],
    )
    for how in ("inner", "left"):
        plain = left.join(right, ["k"], how)
        salted = salted_join(left, right, ["k"], how, salt_buckets=8)
        assert sorted(map(tuple, salted.collect())) == \
            sorted(map(tuple, plain.collect())), how


def test_count_distinct_skew_safe(spark):
    from tpg_weather_etl_spark.operators.skew import (
        count_distinct_skew_safe,
    )

    df = _skewed(spark).withColumn("v", F.col("v") % 37)  # repeats
    expected = {
        (r.k, r.n) for r in
        df.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
    }
    got = {
        (r.k, r.n_distinct) for r in
        count_distinct_skew_safe(df, ["k"], "v").collect()
    }
    assert got == expected
