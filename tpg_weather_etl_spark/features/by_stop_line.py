"""features_by_stop_line builder (reference
src/11_build_features_by_stop_line.py) — the core analytic hash-agg
(A8): per (line_text, stop_code, stop_key, sched_bin) delay and
weather summaries, with the reference's exact quantile semantics:
p50 = interpolating median (DuckDB MEDIAN), p90 = discrete quantile
(DuckDB QUANTILE → hazard H3, operators/quantiles.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tpg_weather_etl_spark.operators.quantiles import with_group_quantiles
from tpg_weather_etl_spark.schemas import WEATHER_MEASURES

LATE_THRESHOLD_MIN = 2.0  # share_late_ge2 (ref 11:117)


def build_features_by_stop_line(features_events: DataFrame) -> DataFrame:
    """ref 11:84-139: base projection + P7 filter, then A8 aggregate."""
    base = features_events.filter(F.col("sched_bin").isNotNull()).withColumn(
        # ref 11:93 coalesces per-row BEFORE the MAX aggregate, so an
        # all-NULL-name group yields the stop code, not NULL
        "stop_name",
        F.coalesce(F.col("stop_name"), F.col("stop_code").cast("string")),
    ).withColumn(
        "stop_key",
        # reference uses `line || '·' || stop` (NULL-propagating ||);
        # rows are non-null post-filter but F.concat matches semantics
        F.concat(F.col("line_text"), F.lit("·"),
                 F.col("stop_code").cast("string")),
    )
    weather_aggs = [F.avg(c).alias(f"{c}_mean") for c in WEATHER_MEASURES]
    weather_aggs.insert(2, F.max("rain_mm").alias("rain_mm_max"))
    extra = [
        F.count(F.lit(1)).alias("n_trips"),
        F.avg("delay_min").alias("delay_avg_min"),
        F.median("delay_min").alias("delay_p50_min"),
        F.avg(F.when(F.col("delay_min") >= LATE_THRESHOLD_MIN, 1.0)
              .when(F.col("delay_min").isNotNull(), 0.0)).alias("share_late_ge2"),
        F.avg(F.col("any_coalesce_from_arrival").cast("double"))
         .alias("share_coalesce"),
        F.max("stop_name").alias("stop_name"),
        *weather_aggs,
    ]
    return with_group_quantiles(
        base,
        group_cols=["line_text", "stop_code", "stop_key", "sched_bin"],
        value_col="delay_min",
        quantiles={"delay_p90_min": 0.9},
        extra_aggs=extra,
    )


def qc_features_by_stop_line(df: DataFrame) -> dict[str, int]:
    """QC parity with ref 11:141-151."""
    row = df.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.count_distinct(F.col("sched_bin")).alias("n_distinct_bins"),
        F.count_distinct(F.col("stop_key")).alias("n_stop_keys"),
    ).collect()[0]
    return {k: int(row[k] or 0) for k in row.__fields__}
