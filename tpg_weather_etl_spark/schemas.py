"""Schema layer — StructTypes mirroring the reference warehouse DDL
(reference: src/common.py:93-194) plus raw CSV schemas for the three
source families.

Spark holds no PRIMARY KEY / FOREIGN KEY / sequence / index constraints
(common.py:97,118,129,152-154): keys become dedupe logic (operators/
dedupe.py), sequences become monotonically_increasing_id, indexes
become partition layout (sources/writers.py).

GTFS planned times deliberately stay strings — they exceed 24:00:00
(e.g. "25:10:00", common.py:126-127).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Warehouse tables (normalized)
# --------------------------------------------------------------------------

GTFS_STOPS = T.StructType([
    T.StructField("stop_id", T.StringType(), False),
    T.StructField("stop_name", T.StringType(), True),
    T.StructField("stop_lat", T.DoubleType(), True),
    T.StructField("stop_lon", T.DoubleType(), True),
    T.StructField("zone_id", T.StringType(), True),
    T.StructField("location_type", T.StringType(), True),
    T.StructField("parent_station", T.StringType(), True),
    T.StructField("platform_code", T.StringType(), True),
    T.StructField("feed_version", T.StringType(), True),
])

GTFS_ROUTES = T.StructType([
    T.StructField("route_id", T.StringType(), False),
    T.StructField("route_short_name", T.StringType(), True),
    T.StructField("route_long_name", T.StringType(), True),
    T.StructField("route_type", T.IntegerType(), True),
    T.StructField("operator_name", T.StringType(), True),
    T.StructField("feed_version", T.StringType(), True),
])

GTFS_TRIPS = T.StructType([
    T.StructField("trip_id", T.StringType(), False),
    T.StructField("route_id", T.StringType(), True),
    T.StructField("service_id", T.StringType(), True),
    T.StructField("direction_id", T.IntegerType(), True),
    T.StructField("trip_headsign", T.StringType(), True),
    T.StructField("feed_version", T.StringType(), True),
])

GTFS_STOP_TIMES = T.StructType([
    T.StructField("trip_id", T.StringType(), False),
    T.StructField("stop_sequence", T.IntegerType(), False),
    T.StructField("stop_id", T.StringType(), True),
    T.StructField("arrival_time_planned", T.StringType(), True),   # >24h clock
    T.StructField("departure_time_planned", T.StringType(), True),  # >24h clock
    T.StructField("feed_version", T.StringType(), True),
])

IST_EVENTS = T.StructType([
    T.StructField("service_date", T.DateType(), True),
    T.StructField("fahrt_bezeichner", T.StringType(), True),
    T.StructField("operator_abbr", T.StringType(), True),
    T.StructField("product_id", T.StringType(), True),
    T.StructField("line_text", T.StringType(), True),
    T.StructField("stop_name", T.StringType(), True),
    T.StructField("stop_code", T.StringType(), True),
    T.StructField("arrival_sched_ts", T.TimestampType(), True),
    T.StructField("arrival_est_ts", T.TimestampType(), True),
    T.StructField("arrival_status", T.StringType(), True),
    T.StructField("depart_sched_ts", T.TimestampType(), True),
    T.StructField("depart_est_ts", T.TimestampType(), True),
    T.StructField("depart_status", T.StringType(), True),
    T.StructField("pass_through", T.BooleanType(), True),
    T.StructField("is_extra_trip", T.BooleanType(), True),
    T.StructField("is_cancelled", T.BooleanType(), True),
])

WEATHER_MEASURES = [
    "temp_c", "rain_mm", "wind_ms", "gust_ms", "wind_dir_deg",
    "humidity", "pressure_hpa", "global_rad_wm2", "sunshine_min",
    "dewpoint_c",
]

WEATHER_OBS = T.StructType(
    [
        T.StructField("station_id", T.StringType(), False),
        T.StructField("ts_utc", T.TimestampType(), False),
    ]
    + [T.StructField(c, T.DoubleType(), True) for c in WEATHER_MEASURES]
)

STOP_TO_STATION = T.StructType([
    T.StructField("stop_code", T.StringType(), False),
    T.StructField("station_id", T.StringType(), False),
])

# --------------------------------------------------------------------------
# Raw CSV column maps (rename German/raw headers → canonical)
# --------------------------------------------------------------------------

# IstDaten raw → normalized (reference COLMAP 02_ingest_istdaten.py:45-62)
IST_COLMAP = {
    "BETRIEBSTAG": "service_date",
    "FAHRT_BEZEICHNER": "fahrt_bezeichner",
    "BETREIBER_ABK": "operator_abbr",
    "PRODUKT_ID": "product_id",
    "LINIEN_TEXT": "line_text",
    "HALTESTELLEN_NAME": "stop_name",
    "BPUIC": "stop_code",
    "ANKUNFTSZEIT": "arrival_sched_ts",
    "AN_PROGNOSE": "arrival_est_ts",
    "AN_PROGNOSE_STATUS": "arrival_status",
    "ABFAHRTSZEIT": "depart_sched_ts",
    "AB_PROGNOSE": "depart_est_ts",
    "AB_PROGNOSE_STATUS": "depart_status",
    "DURCHFAHRT_TF": "pass_through",
    "ZUSATZFAHRT_TF": "is_extra_trip",
    "FAELLT_AUS_TF": "is_cancelled",
}

# MeteoSwiss raw → normalized (reference 03_ingest_weather.py:36-49).
# Wind/gust arrive in km/h and are converted to m/s during normalize.
WEATHER_COLMAP = {
    "station_abbr": "station_id",
    "reference_timestamp": "ts_utc",
    "tre200s0": "temp_c",
    "rre150z0": "rain_mm",
    "fu3010z0": "wind_kmh",
    "fu3010z1": "gust_kmh",
    "dkl010z0": "wind_dir_deg",
    "ure200s0": "humidity",
    "prestas0": "pressure_hpa",
    "gre000z0": "global_rad_wm2",
    "sre000z0": "sunshine_min",
    "tde200s0": "dewpoint_c",
}

GTFS_REQUIRED = {
    "agency": ["agency_id", "agency_name"],
    "routes": ["route_id", "route_type"],
    "trips": ["trip_id", "route_id", "service_id"],
    "stop_times": ["trip_id", "stop_sequence", "stop_id",
                   "arrival_time", "departure_time"],
    "stops": ["stop_id", "stop_name", "stop_lat", "stop_lon"],
}

GTFS_OPTIONAL_DEFAULTS = {
    "routes": ["route_short_name", "route_long_name", "agency_id"],
    "trips": ["direction_id", "trip_headsign"],
    "stops": ["location_type", "parent_station", "platform_code", "zone_id"],
}
