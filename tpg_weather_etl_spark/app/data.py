"""Data layer for the two dashboards (reference app/streamlit_app.py
and app/streamlit_by_stop_line.py), re-expressed as Spark queries.

The reference apps pull full tables into pandas and aggregate there
(e.g. streamlit_app.py:104-139 computes KPIs over the whole features
frame in memory). At 100 TB that is the one thing a dashboard must
never do — every function here pushes the aggregation into Spark and
returns either a scalar dict or a DataFrame that is small *by
construction* (top-N, sample-N, group-by over bounded keys), so the
UI's ``toPandas()`` is always safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tpg_weather_etl_spark.functions.time import dow_monday0

# ref app/streamlit_app.py:56-60
WEATHER_COLS = [
    "temp_c", "rain_mm", "wind_ms", "gust_ms", "wind_dir_deg",
    "humidity", "pressure_hpa", "global_rad_wm2", "sunshine_min",
    "dewpoint_c",
]

LATEST_LIMIT = 50
SAMPLE_SIZE = 100
MISS_TOP_N = 10


# ---------------------------------------------------------------------------
# Event-features dashboard (ref app/streamlit_app.py)
# ---------------------------------------------------------------------------

def load_latest_events(events: DataFrame,
                       limit: int = LATEST_LIMIT) -> DataFrame:
    """Most recent TPG events with the quick delay calc
    (ref streamlit_app.py:79-97). orderBy+limit compiles to
    TakeOrderedAndProject — a top-k per partition then a single merge,
    never a full sort."""
    sched = F.coalesce("depart_sched_ts", "arrival_sched_ts")
    est = F.coalesce("depart_est_ts", "arrival_est_ts")
    return (
        events.filter(
            (F.col("operator_abbr") == "TPG")
            & (F.col("product_id").isin("Bus", "Tram")
               | F.col("product_id").isNull())
        )
        .select(
            "service_date", "line_text", "stop_name",
            sched.alias("sched_ts"), est.alias("est_ts"),
            (F.unix_timestamp(est) - F.unix_timestamp(sched))
            .cast("int").alias("delay_sec"),
        )
        .withColumn("delay_min", F.col("delay_sec") / 60.0)
        .orderBy(F.desc("service_date"), F.desc("sched_ts"))
        .limit(limit)
    )


def feature_sample(features: DataFrame, n: int = SAMPLE_SIZE,
                   seed: int = 42) -> DataFrame:
    """Fixed-size reproducible sample (ref streamlit_app.py:100-108).
    rand(seed)-keyed top-k, so only n rows ever leave the executors."""
    return features.orderBy(F.rand(seed)).limit(n)


def compute_kpis(features: DataFrame) -> dict:
    """Top-level QA KPIs (ref streamlit_app.py:111-139) in ONE
    aggregate pass (the reference does five pandas scans)."""
    cols = set(features.columns)
    aggs = [F.count(F.lit(1)).alias("rows_total")]
    if {"depart_sched_ts", "depart_est_ts"} <= cols:
        aggs.append(F.sum(
            (F.col("depart_sched_ts").isNotNull()
             & F.col("depart_est_ts").isNotNull()).cast("long")
        ).alias("both_depart_present"))
    if "any_coalesce_from_arrival" in cols:
        aggs.append(
            (F.avg(F.col("any_coalesce_from_arrival").cast("double")) * 100)
            .alias("pct_any_coalesce"))
    if {"sched_ts", "est_ts"} <= cols:
        aggs.append(F.sum(
            (F.col("sched_ts").isNull() | F.col("est_ts").isNull())
            .cast("long")).alias("unusable"))
    if set(WEATHER_COLS) <= cols:
        full = F.lit(True)
        for c in WEATHER_COLS:
            full = full & F.col(c).isNotNull()
        aggs.append(F.sum(full.cast("long")).alias("full_weather_rows"))
    row = features.agg(*aggs).first().asDict()
    row.setdefault("both_depart_present", 0)
    row.setdefault("pct_any_coalesce", float("nan"))
    row.setdefault("unusable", 0)
    row.setdefault("full_weather_rows", None)
    return row


def missing_values_table(features: DataFrame,
                         top_n: int = MISS_TOP_N) -> list[tuple[str, float]]:
    """Top-N columns by %NA (ref streamlit_app.py:143-149): one
    aggregate over all columns, ranked driver-side (#columns rows)."""
    row = features.agg(*[
        F.round(F.avg(F.col(c).isNull().cast("double")) * 100.0, 1).alias(c)
        for c in features.columns
    ]).first().asDict()
    return sorted(row.items(), key=lambda kv: (-(kv[1] or 0.0), kv[0]))[:top_n]


def coalescing_table(features: DataFrame) -> list[tuple[str, int, float]]:
    """(metric, count, percent) rows (ref streamlit_app.py:152-176),
    one aggregate pass."""
    cols = set(features.columns)
    flags = ["coalesce_sched_from_arrival", "coalesce_est_from_arrival",
             "any_coalesce_from_arrival"]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in flags:
        aggs.append((F.sum(F.col(c).cast("long")) if c in cols
                     else F.lit(0)).alias(c))
    aggs.append((F.sum(
        (F.col("depart_sched_ts").isNotNull()
         & F.col("depart_est_ts").isNotNull()).cast("long"))
        if {"depart_sched_ts", "depart_est_ts"} <= cols else F.lit(0)
    ).alias("both_depart_present"))
    row = features.agg(*aggs).first().asDict()
    n = row.pop("__n")
    return [(k, int(v or 0), (100.0 * (v or 0) / n) if n else float("nan"))
            for k, v in row.items()]


# ---------------------------------------------------------------------------
# By-stop-line dashboard (ref app/streamlit_by_stop_line.py)
# ---------------------------------------------------------------------------

# ref streamlit_by_stop_line.py:104-127
METRIC_LABELS = {
    "delay_avg_min": "Average delay (min)",
    "delay_p50_min": "Median delay (min)",
    "delay_p90_min": "P90 delay (min)",
    "share_late_ge2": "Share delays ≥2min",
    "rain_mm_mean": "Rain mean (mm/10min)",
    "rain_mm_max": "Rain max (mm/10min)",
    "wind_ms_mean": "Wind mean (m/s)",
    "gust_ms_mean": "Gust mean (m/s)",
    "temp_c_mean": "Temperature mean (°C)",
    "humidity_mean": "Humidity mean (%)",
    "pressure_hpa_mean": "Pressure mean (hPa)",
    "global_rad_wm2_mean": "Global radiation (W/m²)",
    "sunshine_min_mean": "Sunshine mean (min/10min)",
    "dewpoint_c_mean": "Dew point mean (°C)",
    "share_coalesce": "Share coalesced (arrival→depart)",
}


def enhance_time(gold: DataFrame) -> DataFrame:
    """date/hour/dow helper columns from sched_bin
    (ref streamlit_by_stop_line.py:88-102; dow Monday=0, hazard H6)."""
    return (
        gold.withColumn("date", F.to_date("sched_bin"))
        .withColumn("hour", F.hour("sched_bin"))
        .withColumn("dow", dow_monday0(F.col("sched_bin")))
    )


def line_options(gold: DataFrame) -> list[str]:
    """Distinct lines for the sidebar filter (bounded: #lines)."""
    return [r.line_text for r in gold.select("line_text").na.drop()
            .distinct().orderBy("line_text").collect()]


def stop_options(gold: DataFrame, lines: list[str]) -> list[tuple[str, str]]:
    """(stop_key, stop_name) choices for the selected lines
    (ref streamlit_by_stop_line.py:165-177)."""
    df = gold
    if lines:
        df = df.filter(F.col("line_text").isin(*lines))
    return [(r.stop_key, r.stop_name)
            for r in df.select("stop_key", "stop_name").na.drop()
            .distinct().orderBy("stop_name").collect()]


def filter_view(df: DataFrame, lines: list[str] | None = None,
                stop_keys: list[str] | None = None,
                date_range: tuple | None = None) -> DataFrame:
    """Sidebar filters (ref streamlit_by_stop_line.py:205-216) as
    pushed-down predicates — the parquet scan prunes, pandas never
    sees the unfiltered table."""
    if lines:
        df = df.filter(F.col("line_text").isin(*lines))
    if stop_keys:
        df = df.filter(F.col("stop_key").isin(*stop_keys))
    if date_range:
        d0, d1 = date_range
        df = df.filter((F.col("date") >= F.lit(d0))
                       & (F.col("date") <= F.lit(d1)))
    return df


def kpi_row(view: DataFrame) -> dict:
    """Trips / avg delay / p90 / share-late KPIs
    (ref streamlit_by_stop_line.py:221-236), one aggregate."""
    return view.agg(
        F.sum("n_trips").alias("trips"),
        F.avg("delay_avg_min").alias("avg_delay_min"),
        F.avg("delay_p90_min").alias("p90_delay_min"),
        F.avg("share_late_ge2").alias("share_late_ge2"),
    ).first().asDict()


def timeseries(view: DataFrame, metric: str) -> DataFrame:
    """Per-stop time series of one metric
    (ref streamlit_by_stop_line.py:241-266)."""
    return view.select(
        "sched_bin", "line_text", "stop_key", "stop_name",
        F.col(metric).alias("value"), "n_trips",
    ).orderBy("sched_bin", "line_text", "stop_key")


def heatmap_hour_dow(view: DataFrame) -> DataFrame:
    """hour × dow average-delay heatmap (≤168 rows;
    ref streamlit_by_stop_line.py:269-293)."""
    return (
        view.groupBy("dow", "hour")
        .agg(F.avg("delay_avg_min").alias("delay_avg_min"))
        .orderBy("dow", "hour")
    )
