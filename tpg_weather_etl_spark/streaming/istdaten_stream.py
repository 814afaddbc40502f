"""Streaming IstDaten ingest — Structured Streaming variant of the
batch pipeline (SURVEY §7.5 optional scope; no reference counterpart).

files arriving in a watched directory → same normalize layer as batch
→ watermarked 10-minute tumbling aggregation per (line_text,
stop_code) — the streaming analogue of the A8 feature aggregation.

Dedupe note: the batch A2 priority dedupe needs the whole key group;
streaming applies ``dropDuplicatesWithinWatermark`` on the business
key instead — an explicitly weaker, documented semantics (first
arrival wins within the watermark horizon).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tpg_weather_etl_spark.ingest.istdaten import normalize_istdaten
from tpg_weather_etl_spark.schemas import IST_COLMAP


def _raw_schema() -> T.StructType:
    return T.StructType(
        [T.StructField(c, T.StringType(), True) for c in IST_COLMAP]
    )


def stream_istdaten(
    spark: SparkSession,
    input_dir: str,
    watermark: str = "30 minutes",
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """readStream over a CSV drop directory → normalized event stream.

    Append-mode windowed aggregates downstream only emit once the
    watermark passes a window's end, and the watermark advances
    *between* micro-batches — a window closes only after a later batch
    carries events beyond window_end + watermark delay.
    """
    raw = (
        spark.readStream.schema(_raw_schema())
        .option("sep", ";")
        .option("header", "true")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .csv(input_dir)
    )
    events = normalize_istdaten(raw)
    sched = F.coalesce("depart_sched_ts", "arrival_sched_ts")
    return (
        events.withColumn("sched_ts", sched)
        .filter(F.col("sched_ts").isNotNull())
        .withWatermark("sched_ts", watermark)
        .dropDuplicatesWithinWatermark(
            ["service_date", "fahrt_bezeichner", "stop_code", "sched_ts"]
        )
    )


def stream_delay_features(events: DataFrame) -> DataFrame:
    """Watermarked 10-min tumbling delay aggregation (streaming A8)."""
    est = F.coalesce("depart_est_ts", "arrival_est_ts")
    delayed = events.withColumn(
        "delay_sec",
        (F.unix_timestamp(est) - F.unix_timestamp("sched_ts")).cast("int"),
    )
    return (
        delayed.groupBy(
            F.window("sched_ts", "10 minutes").alias("bin"),
            "line_text", "stop_code",
        )
        .agg(
            F.count(F.lit(1)).alias("n_trips"),
            F.avg(F.col("delay_sec") / 60.0).alias("delay_avg_min"),
            F.sum((F.col("delay_sec") >= 120).cast("int")).alias("n_late_ge2"),
        )
        .select(F.col("bin.start").alias("sched_bin"), "line_text",
                "stop_code", "n_trips", "delay_avg_min", "n_late_ge2")
    )


def write_stream_to_parquet(df: DataFrame, out_dir: str,
                            checkpoint_dir: str):
    """Append sink with checkpointing (exactly-once per file batch)."""
    return (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
    )
