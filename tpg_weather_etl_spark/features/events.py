"""features_events builder (reference src/10_build_features.py).

base (filtered ist_events) → enriched (coalesced targets, bias flags,
delay targets, 10-min bin) → weather join (strict J3 equi-join on the
bin, or as-of J4 within a 5-minute window) → gold.

The reference assembles one big CTAS by string interpolation
(10:149-179); here the variants are ordinary Python branches over
DataFrame expressions. Weather per station-year is ≤ ~52k rows, so the
join side is always broadcast (X13) — at 100 TB of events the plan is
a map-side hash join with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tpg_weather_etl_spark.functions.macros import second_diff
from tpg_weather_etl_spark.functions.time import time_bin
from tpg_weather_etl_spark.operators.asof import asof_join
from tpg_weather_etl_spark.schemas import WEATHER_MEASURES

BIN_MINUTES = 10          # ref 10:61
ASOF_WINDOW_MIN = 5       # ref 10:62


def dominant_station(weather: DataFrame) -> str:
    """A4: argmax station by row count (ref 10:96-107)."""
    row = (
        weather.groupBy("station_id").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("station_id")).limit(1).collect()
    )
    if not row:
        raise ValueError("weather_obs is empty")
    return row[0]["station_id"]


def enrich_events(events: DataFrame) -> DataFrame:
    """Filters + derivations (ref base/enriched CTEs, 10:181-251)."""
    base = events.filter(
        (F.col("operator_abbr") == "TPG")
        & (F.col("product_id").isin("Bus", "Tram")
           | F.col("product_id").isNull())
        & (F.col("arrival_sched_ts").isNotNull()
           | F.col("depart_sched_ts").isNotNull())
    )
    sched = F.coalesce("depart_sched_ts", "arrival_sched_ts")
    est = F.coalesce("depart_est_ts", "arrival_est_ts")
    return (
        base.withColumn("_row_id", F.monotonically_increasing_id())
        .withColumn("sched_ts", sched)
        .withColumn("est_ts", est)
        .withColumn(
            "coalesce_sched_from_arrival",
            F.col("depart_sched_ts").isNull()
            & F.col("arrival_sched_ts").isNotNull(),
        )
        .withColumn(
            "coalesce_est_from_arrival",
            F.col("depart_est_ts").isNull()
            & F.col("arrival_est_ts").isNotNull(),
        )
        .withColumn(
            "any_coalesce_from_arrival",
            F.col("coalesce_sched_from_arrival")
            | F.col("coalesce_est_from_arrival"),
        )
        .withColumn(
            "delay_sec",
            F.when(F.col("est_ts").isNotNull()
                   & F.col("sched_ts").isNotNull(),
                   second_diff(F.col("sched_ts"), F.col("est_ts")).cast("int")),
        )
        .withColumn("delay_min", F.col("delay_sec").cast("double") / 60.0)
        .withColumn(
            "depart_only_delay_sec",
            F.when(F.col("depart_est_ts").isNotNull()
                   & F.col("depart_sched_ts").isNotNull(),
                   second_diff(F.col("depart_sched_ts"),
                               F.col("depart_est_ts")).cast("int")),
        )
        .withColumn("sched_bin", time_bin(F.col("sched_ts"), BIN_MINUTES))
    )


def join_weather(
    enriched: DataFrame,
    weather: DataFrame,
    station_id: str | None = None,
    stop_to_station: DataFrame | None = None,
    asof: bool = False,
) -> DataFrame:
    """J3 strict (default) or J4 as-of weather attachment (10:157-179).

    Station routing precedence (10:135-147): mapping table > explicit
    station_id > dominant station.
    """
    w = weather.select("station_id",
                       F.col("ts_utc").alias("w_ts"), *WEATHER_MEASURES)
    if stop_to_station is not None:
        ev = enriched.join(F.broadcast(stop_to_station), "stop_code", "left")
    else:
        sid = station_id or dominant_station(weather)
        ev = enriched.withColumn("station_id", F.lit(sid))

    if not asof:
        # weather grid scales with stations × time: unhinted, AQE
        # broadcasts only when the grid is genuinely small
        joined = ev.join(
            w,
            (ev["sched_bin"] == w["w_ts"])
            & (ev["station_id"] == w["station_id"]),
            "left",
        ).drop(w["station_id"]).drop("w_ts")
        return joined

    # J4: nearest past obs within ASOF_WINDOW_MIN of the bin. Weather
    # sits on a strict 10-min grid (H4), so the 5-min window admits
    # only the bin itself — we still run the general grid form so gaps
    # and off-grid data behave; tolerance 5 // grid 10 → k=0 candidates
    # degenerate to the strict join, hence grid_minutes=5 keeps the
    # semantics "obs in [bin-5min, bin]".
    joined = asof_join(
        ev.withColumnRenamed("_row_id", "row_id"),
        w.withColumnRenamed("w_ts", "ts_utc"),
        left_ts="sched_bin",
        right_ts="ts_utc",
        on=["station_id"],
        tolerance_minutes=ASOF_WINDOW_MIN,
        grid_minutes=None,  # general range form: obs may be off-grid
        # ref 10_build_features.py:253-264 DELETEs rows whose nearest
        # obs is missing or outside the window — asof mode is inner
        how="inner",
    )
    return joined.withColumnRenamed("row_id", "_row_id").drop("ts_utc")


def build_features_events(
    events: DataFrame,
    weather: DataFrame,
    station_id: str | None = None,
    stop_to_station: DataFrame | None = None,
    asof: bool = False,
) -> DataFrame:
    """Full features_events output (columns per ref 10:239-250)."""
    out = join_weather(enrich_events(events), weather,
                       station_id=station_id,
                       stop_to_station=stop_to_station, asof=asof)
    cols = [
        "service_date", "line_text", "stop_name", "stop_code",
        "arrival_sched_ts", "arrival_est_ts", "depart_sched_ts",
        "depart_est_ts", "sched_ts", "est_ts",
        "coalesce_sched_from_arrival", "coalesce_est_from_arrival",
        "any_coalesce_from_arrival", "delay_sec", "delay_min",
        "depart_only_delay_sec", "sched_bin", "station_id",
        *WEATHER_MEASURES,
    ]
    return out.select(*[c for c in cols if c in out.columns])


def qc_features_events(features: DataFrame) -> dict[str, int]:
    """QC aggregates (A9, ref 10:266-282) as assertable values."""
    row = features.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("coalesce_sched_from_arrival").cast("int")).alias("n_coalesce_sched"),
        F.sum(F.col("coalesce_est_from_arrival").cast("int")).alias("n_coalesce_est"),
        F.sum((F.col("delay_sec").isNull()).cast("int")).alias("n_unusable_delay"),
        F.sum(F.col("temp_c").isNotNull().cast("int")).alias("n_with_weather"),
    ).collect()[0]
    return {k: int(row[k] or 0) for k in row.__fields__}
