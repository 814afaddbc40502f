"""Arrow-vectorized Python operator tier: scalar pandas_udf parity
with the JVM path, applyInPandas grouped model fits, Spark 4 UDTF."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_cosine_pandas_udf_matches_jvm(spark):
    from tpg_weather_etl_spark.functions.vectors import cosine_similarity
    from tpg_weather_etl_spark.operators.pandas_ops import cosine_pandas_udf
    from tpg_weather_etl_spark.sources.tables import read_table

    e = read_table(spark, "/root/testdata/sf0.001", "embeddings") \
        .limit(50).select("vec_id", "embedding")
    a = e.select(F.col("vec_id"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id"), F.reverse(F.col("embedding")).alias("eb"))
    both = a.join(b, "vec_id")
    out = both.select(
        "vec_id",
        cosine_similarity(F.col("ea"), F.col("eb")).alias("jvm"),
        cosine_pandas_udf(F.col("ea"), F.col("eb")).alias("py"),
    ).collect()
    assert len(out) == 50
    for r in out:
        assert r.py == pytest.approx(r.jvm, abs=1e-9)


def test_grouped_ols_matches_closed_form(spark):
    from tpg_weather_etl_spark.operators.pandas_ops import grouped_ols

    # y = 3x + 7 (+ deterministic residual) per group; one degenerate
    rows = []
    for g, slope, icpt in [("a", 3.0, 7.0), ("b", -1.5, 2.0)]:
        for i in range(40):
            rows.append((g, float(i), slope * i + icpt
                         + (0.25 if i % 2 else -0.25)))
    rows.append(("tiny", 1.0, 5.0))          # n=1 → NaN
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {r.group_key: r for r in grouped_ols(df, "k", "x", "y").collect()}
    # residual is mean-zero and symmetric around even/odd x → the OLS
    # slope picks up a tiny tilt; compare against numpy directly
    import numpy as np
    for g in ("a", "b"):
        xs = np.array([r[1] for r in rows if r[0] == g])
        ys = np.array([r[2] for r in rows if r[0] == g])
        s, c = np.polyfit(xs, ys, 1)
        assert got[g].slope == pytest.approx(s, abs=1e-9)
        assert got[g].intercept == pytest.approx(c, abs=1e-9)
        assert got[g].n == 40
    # NaN may cross the Arrow boundary as null depending on dtype
    assert got["tiny"].slope is None or math.isnan(got["tiny"].slope)


def test_doc_chunk_udtf_sql(spark):
    from tpg_weather_etl_spark.operators.pandas_ops import (
        register_doc_chunk_udtf,
    )

    register_doc_chunk_udtf(spark, "doc_chunks_t", chunk_tokens=3)
    out = spark.sql(
        "SELECT * FROM doc_chunks_t(7L, 'a b c d e f g')"
    ).collect()
    chunks = {(r.chunk_idx, r.chunk_text, r.n_tokens) for r in out}
    assert chunks == {(0, "a b c", 3), (1, "d e f", 3), (2, "g", 1)}
    assert all(r.doc_id == 7 for r in out)


def test_arrow_affine_matches_column_expr(spark):
    from pyspark.sql import functions as F

    from tpg_weather_etl_spark.operators.pandas_ops import arrow_affine
    from tpg_weather_etl_spark.sources.tables import read_table

    e = read_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "value").filter(F.col("value").isNotNull()).limit(200)
    got = {r.event_id: r.scaled
           for r in arrow_affine(e, "value", 2.5, -1.0,
                                 out_col="scaled").collect()}
    want = {r.event_id: r.scaled
            for r in e.withColumn(
                "scaled",
                F.col("value").cast("double") * 2.5 - 1.0).collect()}
    assert got == want  # bit-identical IEEE, not approx
