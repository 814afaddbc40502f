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


def stream_weather(
    spark: SparkSession,
    input_dir: str,
    watermark: str = "1 hour",
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """readStream over a MeteoSwiss CSV drop directory → normalized
    watermarked observation stream (same normalize layer as batch,
    incl. '-' sentinel nulls and km/h→m/s)."""
    from tpg_weather_etl_spark.ingest.weather import normalize_weather
    from tpg_weather_etl_spark.schemas import WEATHER_COLMAP

    schema = T.StructType(
        [T.StructField(c, T.StringType(), True) for c in WEATHER_COLMAP]
    )
    raw = (
        spark.readStream.schema(schema)
        .option("sep", ";")
        .option("header", "true")
        .option("nullValue", "-")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .csv(input_dir)
    )
    return normalize_weather(raw).withWatermark("ts_utc", watermark)


def stream_join_weather(
    events: DataFrame,
    weather: DataFrame,
    station_id: str,
    bin_minutes: int = 10,
) -> DataFrame:
    """Watermarked stream-stream INNER join — the streaming form of
    the batch strict weather join (J3): each event's 10-minute bin
    equi-joins the observation at (station, bin).

    State-boundedness: a bare equi-join on the derived bin would force
    Spark to keep both sides' state forever; the explicit event-time
    range (ts_utc ∈ (sched_ts − bin, sched_ts]) is implied by the bin
    equality but stated so the planner derives watermark-based state
    eviction for BOTH sides. Inner-join rows emit as soon as both
    sides arrive; the watermarks only gate state cleanup.
    """
    from tpg_weather_etl_spark.functions.time import time_bin

    ev = (
        events.withColumn("sched_bin",
                          time_bin(F.col("sched_ts"), bin_minutes))
        .withColumn("station_id", F.lit(station_id))
    )
    wx = weather.filter(F.col("station_id") == station_id).select(
        F.col("station_id").alias("w_station"),
        F.col("ts_utc"), "temp_c", "rain_mm", "wind_ms", "gust_ms",
    )
    cond = (
        (ev["station_id"] == wx["w_station"])
        & (wx["ts_utc"] == ev["sched_bin"])
        & (wx["ts_utc"] > ev["sched_ts"]
           - F.expr(f"INTERVAL {bin_minutes} MINUTES"))
        & (wx["ts_utc"] <= ev["sched_ts"])
    )
    return ev.join(wx, cond, "inner").drop("w_station", "ts_utc")


def stream_enrich_dim(events: DataFrame, dim: DataFrame,
                      key: str) -> DataFrame:
    """Stream-STATIC broadcast enrichment — the third streaming join
    form next to the stream-stream weather join and the foreachBatch
    upsert. The static side is broadcast to every micro-batch task
    (re-resolved per batch, so a refreshed dim snapshot is picked up
    on the next trigger); no state store is involved at all, which is
    what makes this the right plan for dimension enrichment — a
    stream-stream join would build pointless watermark state for a
    table that never expires.
    """
    return events.join(F.broadcast(dim), key, "left")


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


def write_stream_upsert(df: DataFrame, target_path: str,
                        checkpoint_dir: str,
                        station_col: str = "station_id",
                        ts_col: str = "ts_utc"):
    """Upsert sink: each micro-batch runs the K6 per-station
    range-overwrite against the target table via ``foreachBatch`` —
    the streaming counterpart of the batch ``upsert_station_range``
    (late re-deliveries replace the overlapping window instead of
    duplicating it).

    Exactly-once: foreachBatch may re-run a batch on recovery, but the
    upsert is idempotent (DELETE range + INSERT same rows), which is
    the standard contract for foreachBatch sinks.
    """
    from tpg_weather_etl_spark.sources.writers import upsert_station_range

    def _do_upsert(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_station_range(
            batch_df.sparkSession, target_path, batch_df,
            station_col=station_col, ts_col=ts_col,
        )

    return (
        df.writeStream.foreachBatch(_do_upsert)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
    )


def stream_trip_sessions(events: DataFrame,
                         gap: str = "15 minutes") -> DataFrame:
    """Per-trip session windows on the event stream: consecutive stop
    events of a trip merge while gaps stay under ``gap`` — Spark's
    ``session_window`` state operator (variable-length windows with
    watermark-driven eviction; a different state path from the
    fixed-window aggs above). Emits one row per closed session with
    event count and max departure delay.
    """
    est = F.coalesce("depart_est_ts", "arrival_est_ts")
    delayed = events.withColumn(
        "delay_sec",
        (F.unix_timestamp(est) - F.unix_timestamp("sched_ts")).cast("int"),
    )
    return (
        delayed.groupBy(
            F.col("fahrt_bezeichner"),
            F.session_window(F.col("sched_ts"), gap),
        )
        .agg(
            F.count(F.lit(1)).alias("n_stops"),
            F.max("delay_sec").alias("max_delay_sec"),
        )
        .select(
            "fahrt_bezeichner",
            F.col("session_window.start").alias("s_start"),
            F.col("session_window.end").alias("s_end"),
            "n_stops", "max_delay_sec",
        )
    )
