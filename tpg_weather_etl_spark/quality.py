"""Data-quality aggregates (reference A9-A11 + dashboard KPI logic,
app/streamlit_app.py:112-175) as assertable one-pass checks."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_rates(df: DataFrame, cols: list[str] | None = None) -> dict[str, float]:
    """A10: per-column null fraction (app1:142-148)."""
    cols = cols or df.columns
    row = df.agg(
        *[F.avg(F.col(c).isNull().cast("double")).alias(c) for c in cols]
    ).collect()[0]
    return {c: float(row[c] or 0.0) for c in cols}


def kpi_summary(features: DataFrame) -> dict[str, int]:
    """A11: KPI boolean-mask sums (app1:112-139)."""
    row = features.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum((F.col("depart_sched_ts").isNotNull()
               & F.col("depart_est_ts").isNotNull()).cast("int")
              ).alias("both_depart_present"),
        F.sum(F.col("any_coalesce_from_arrival").cast("int")).alias("n_coalesce"),
        F.sum((F.col("delay_sec").isNull()).cast("int")).alias("n_unusable"),
        F.sum(F.col("temp_c").isNotNull().cast("int")).alias("n_full_weather"),
    ).collect()[0]
    return {k: int(row[k] or 0) for k in row.__fields__}


def assert_unique_key(df: DataFrame, key_cols: list[str]) -> None:
    """PRIMARY-KEY surrogate: fail fast if the key is not unique."""
    dups = (
        df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1).limit(1).collect()
    )
    if dups:
        raise AssertionError(f"duplicate key {key_cols}: {dups[0]}")
