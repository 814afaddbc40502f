"""Full-path dashboard E2E (closing the round-5 inferential gap): raw
semicolon CSVs → ingest (normalize + dedupe) → features_events →
features_by_stop_line → gold parquet roundtrip → both dashboards' data
functions — with the reference pipeline's LITERAL SQL
(src/10_build_features.py:181-251 strict branch,
src/11_build_features_by_stop_line.py:84-139) replayed in DuckDB over
the very same ingested inputs and compared value-for-value. Unlike the
gate queries (TPC-H-ish tables), this drives the reference-shaped
transit/weather pipeline end-to-end.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from tpg_weather_etl_spark.app import data as D
from tpg_weather_etl_spark.features.by_stop_line import (
    build_features_by_stop_line,
)
from tpg_weather_etl_spark.features.events import build_features_events
from tpg_weather_etl_spark.ingest.istdaten import (
    dedupe_istdaten,
    normalize_istdaten,
)
from tpg_weather_etl_spark.ingest.weather import (
    dedupe_weather,
    normalize_weather,
)
from tpg_weather_etl_spark.schemas import IST_COLMAP, WEATHER_COLMAP
from tpg_weather_etl_spark.sources.readers import read_semicolon_csv

from test_ingest import _ist_csv, _ist_row, _wx_csv, _wx_row

D1, D2 = "01.02.2024", "02.02.2024"


def _raw_events(spark, tmp_path):
    rows = [
        # day 1 — full row, dep delay 120s, bin 08:00
        _ist_row(date=D1, fahrt="t1", a_sched=f"{D1} 08:00:00",
                 a_est=f"{D1} 08:02:00", d_sched=f"{D1} 08:01:00",
                 d_est=f"{D1} 08:03:00"),
        # PROGNOSE duplicate of t1 — priority dedupe must drop it
        _ist_row(date=D1, fahrt="t1", a_st="PROGNOSE", d_st="PROGNOSE",
                 a_sched=f"{D1} 08:00:00", a_est=f"{D1} 08:09:00",
                 d_sched=f"{D1} 08:01:00", d_est=f"{D1} 08:09:00"),
        # arrival-only → both coalesce flags fire, bin 08:10
        _ist_row(date=D1, fahrt="t2", a_sched=f"{D1} 08:10:00",
                 a_est=f"{D1} 08:12:00", d_sched="", d_est=""),
        # early departure (−60s), bin 08:00, stop 8502
        _ist_row(date=D1, fahrt="t3", stop="8502", stop_name="Bel-Air",
                 a_sched=f"{D1} 08:03:00", a_est=f"{D1} 08:05:00",
                 d_sched=f"{D1} 08:04:00", d_est=f"{D1} 08:03:00"),
        # line 14, +600s, bin 08:10
        _ist_row(date=D1, fahrt="t4", line="14", stop="8502",
                 stop_name="Bel-Air", a_sched=f"{D1} 08:11:00",
                 a_est=f"{D1} 08:20:00", d_sched=f"{D1} 08:12:00",
                 d_est=f"{D1} 08:22:00"),
        # filtered: operator / product
        _ist_row(date=D1, fahrt="t9", op="SBB"),
        _ist_row(date=D1, fahrt="t9", prod="Zug"),
        # no sched at all → dropped by the base WHERE (10:191-194)
        _ist_row(date=D1, fahrt="t8", a_sched="", d_sched="",
                 a_est=f"{D1} 08:30:00", d_est=""),
        # day 2 — on time, bin 07:50
        _ist_row(date=D2, fahrt="t1", a_sched=f"{D2} 07:54:00",
                 a_est=f"{D2} 07:54:00", d_sched=f"{D2} 07:55:00",
                 d_est=f"{D2} 07:55:00"),
        # day 2 — line 14, +120s, bin 08:00
        _ist_row(date=D2, fahrt="t5", line="14", stop="8502",
                 stop_name="Bel-Air", a_sched=f"{D2} 08:06:00",
                 a_est=f"{D2} 08:08:00", d_sched=f"{D2} 08:07:00",
                 d_est=f"{D2} 08:09:00"),
    ]
    p = _ist_csv(tmp_path, "e2e_istdaten.csv", rows)
    raw = read_semicolon_csv(spark, [p], usecols=list(IST_COLMAP))
    return dedupe_istdaten(normalize_istdaten(raw))


def _raw_weather(spark, tmp_path):
    rows = [
        _wx_row(ts=f"{D1} 08:00"),
        # '-' sentinel: temp NULL at the 08:10 bin
        _wx_row(ts=f"{D1} 08:10", temp="-", rain="0.4"),
        _wx_row(ts=f"{D2} 07:50", temp="3.0"),
        # duplicate observation pair → median collapse to temp 2.0
        _wx_row(ts=f"{D2} 08:00", temp="1.0"),
        _wx_row(ts=f"{D2} 08:00", temp="3.0"),
        # other station must NOT join under the strict GVE filter
        _wx_row(st="COI", ts=f"{D1} 08:00", temp="-15.0"),
    ]
    p = _wx_csv(tmp_path, "e2e_weather.csv", rows)
    raw = read_semicolon_csv(spark, [p], usecols=list(WEATHER_COLMAP),
                             null_value="-")
    return dedupe_weather(normalize_weather(raw))


# The reference's literal feature SQL (10:181-251), strict branch with
# chosen_station='GVE', use_mapping=False, BIN_MINUTES=10.
REF_FEATURES_SQL = """
CREATE OR REPLACE TABLE features_events AS
WITH base AS (
  SELECT
    service_date,
    operator_abbr, product_id, line_text,
    stop_name, stop_code,
    arrival_sched_ts, arrival_est_ts,
    depart_sched_ts,  depart_est_ts
  FROM ist_events
  WHERE operator_abbr = 'TPG'
    AND (product_id IN ('Bus','Tram') OR product_id IS NULL)
    AND (arrival_sched_ts IS NOT NULL OR depart_sched_ts IS NOT NULL)
),
enriched AS (
  SELECT
    ROW_NUMBER() OVER () AS _row_id,
    base.*,
    COALESCE(depart_sched_ts, arrival_sched_ts) AS sched_ts,
    COALESCE(depart_est_ts,   arrival_est_ts)   AS est_ts,
    (depart_sched_ts IS NULL AND arrival_sched_ts IS NOT NULL)
      AS coalesce_sched_from_arrival,
    (depart_est_ts   IS NULL AND arrival_est_ts   IS NOT NULL)
      AS coalesce_est_from_arrival,
    ((depart_sched_ts IS NULL AND arrival_sched_ts IS NOT NULL)
      OR (depart_est_ts IS NULL AND arrival_est_ts IS NOT NULL))
      AS any_coalesce_from_arrival,
    CASE
      WHEN COALESCE(depart_sched_ts, arrival_sched_ts) IS NOT NULL
       AND COALESCE(depart_est_ts,   arrival_est_ts)   IS NOT NULL
      THEN DATE_DIFF('second',
                     CAST(COALESCE(depart_sched_ts, arrival_sched_ts)
                          AS TIMESTAMP),
                     CAST(COALESCE(depart_est_ts, arrival_est_ts)
                          AS TIMESTAMP))
      ELSE NULL
    END AS delay_sec,
    CASE
      WHEN depart_sched_ts IS NOT NULL AND depart_est_ts IS NOT NULL
      THEN DATE_DIFF('second', CAST(depart_sched_ts AS TIMESTAMP),
                     CAST(depart_est_ts AS TIMESTAMP))
      ELSE NULL
    END AS depart_only_delay_sec,
    (TIMESTAMP '1970-01-01'
      + INTERVAL (FLOOR(
          DATE_DIFF('minute', TIMESTAMP '1970-01-01',
                    COALESCE(depart_sched_ts, arrival_sched_ts)) / 10
        ) * 10) MINUTE
    ) AS sched_bin
  FROM base
),
weather_join AS (
  SELECT e.*,
         w.temp_c, w.rain_mm, w.wind_ms, w.gust_ms, w.wind_dir_deg,
         w.humidity, w.pressure_hpa, w.global_rad_wm2, w.sunshine_min,
         w.dewpoint_c
  FROM enriched e
  LEFT JOIN weather_obs w
    ON w.ts_utc = e.sched_bin
   AND w.station_id = 'GVE'
)
SELECT
  service_date, line_text, stop_name, stop_code,
  arrival_sched_ts, arrival_est_ts, depart_sched_ts, depart_est_ts,
  sched_ts, est_ts,
  coalesce_sched_from_arrival, coalesce_est_from_arrival,
  any_coalesce_from_arrival,
  delay_sec, CAST(delay_sec AS DOUBLE)/60.0 AS delay_min,
  depart_only_delay_sec,
  sched_bin,
  temp_c, rain_mm, wind_ms, gust_ms, wind_dir_deg,
  humidity, pressure_hpa, global_rad_wm2, sunshine_min, dewpoint_c
FROM weather_join
"""

# The reference's literal gold SQL (11:84-139).
REF_GOLD_SQL = """
CREATE OR REPLACE TABLE features_by_stop_line AS
WITH base AS (
  SELECT
    line_text,
    stop_code,
    COALESCE(stop_name, CAST(stop_code AS VARCHAR)) AS stop_name,
    sched_bin,
    delay_min,
    any_coalesce_from_arrival,
    temp_c, rain_mm, wind_ms, gust_ms, wind_dir_deg,
    humidity, pressure_hpa, global_rad_wm2, sunshine_min, dewpoint_c
  FROM features_events
  WHERE sched_bin IS NOT NULL
),
aggr AS (
  SELECT
    line_text,
    stop_code,
    line_text || '·' || CAST(stop_code AS VARCHAR) AS stop_key,
    MAX(stop_name) AS stop_name,
    sched_bin,
    CAST(COUNT(*) AS BIGINT)                 AS n_trips,
    CAST(AVG(delay_min) AS DOUBLE)           AS delay_avg_min,
    MEDIAN(delay_min)                        AS delay_p50_min,
    QUANTILE(delay_min, 0.9)                 AS delay_p90_min,
    AVG(CAST(delay_min >= 2 AS DOUBLE))      AS share_late_ge2,
    AVG(CAST(any_coalesce_from_arrival AS DOUBLE)) AS share_coalesce,
    AVG(temp_c)           AS temp_c_mean,
    AVG(rain_mm)          AS rain_mm_mean,
    MAX(rain_mm)          AS rain_mm_max,
    AVG(wind_ms)          AS wind_ms_mean,
    AVG(gust_ms)          AS gust_ms_mean,
    AVG(wind_dir_deg)     AS wind_dir_deg_mean,
    AVG(humidity)         AS humidity_mean,
    AVG(pressure_hpa)     AS pressure_hpa_mean,
    AVG(global_rad_wm2)   AS global_rad_wm2_mean,
    AVG(sunshine_min)     AS sunshine_min_mean,
    AVG(dewpoint_c)       AS dewpoint_c_mean
  FROM base
  GROUP BY 1,2,3,5
)
SELECT * FROM aggr
"""


def _canon(v):
    if v is None:
        return "~"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    return str(v)


def _rows(cols, recs):
    return sorted(tuple(_canon(r[c]) for c in cols) for r in recs)


@pytest.fixture(scope="module")
def e2e(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e_dash")
    events = _raw_events(spark, tmp)
    weather = _raw_weather(spark, tmp)

    feats = build_features_events(events, weather, station_id="GVE")
    gold = build_features_by_stop_line(feats)

    # gold contract: parquet roundtrip, like the real dashboards read
    fdir, gdir = str(tmp / "features_events"), str(tmp / "gold")
    feats.write.mode("overwrite").parquet(fdir)
    gold.write.mode("overwrite").parquet(gdir)

    con = duckdb.connect()
    con.register("ist_events", events.toPandas())
    con.register("weather_obs", weather.toPandas())
    con.execute(REF_FEATURES_SQL)
    con.execute(REF_GOLD_SQL)

    return {
        "feats": spark.read.parquet(fdir),
        "gold": spark.read.parquet(gdir),
        "con": con,
    }


FEAT_COLS = [
    "service_date", "line_text", "stop_name", "stop_code",
    "arrival_sched_ts", "arrival_est_ts", "depart_sched_ts",
    "depart_est_ts", "sched_ts", "est_ts",
    "coalesce_sched_from_arrival", "coalesce_est_from_arrival",
    "any_coalesce_from_arrival", "delay_sec", "delay_min",
    "depart_only_delay_sec", "sched_bin",
    "temp_c", "rain_mm", "wind_ms", "gust_ms", "wind_dir_deg",
    "humidity", "pressure_hpa", "global_rad_wm2", "sunshine_min",
    "dewpoint_c",
]

GOLD_COLS = [
    "line_text", "stop_code", "stop_key", "stop_name", "sched_bin",
    "n_trips", "delay_avg_min", "delay_p50_min", "delay_p90_min",
    "share_late_ge2", "share_coalesce",
    "temp_c_mean", "rain_mm_mean", "rain_mm_max", "wind_ms_mean",
    "gust_ms_mean", "wind_dir_deg_mean", "humidity_mean",
    "pressure_hpa_mean", "global_rad_wm2_mean", "sunshine_min_mean",
    "dewpoint_c_mean",
]


def test_features_events_match_reference_sql(e2e):
    got = [r.asDict() for r in e2e["feats"].select(*FEAT_COLS).collect()]
    ref_rel = e2e["con"].execute(
        "SELECT " + ", ".join(FEAT_COLS) + " FROM features_events")
    want = [dict(zip(FEAT_COLS, row)) for row in ref_rel.fetchall()]
    assert len(got) == 6 and len(want) == 6
    assert _rows(FEAT_COLS, got) == _rows(FEAT_COLS, want)


def test_gold_matches_reference_sql(e2e):
    got = [r.asDict() for r in e2e["gold"].select(*GOLD_COLS).collect()]
    ref_rel = e2e["con"].execute(
        "SELECT " + ", ".join(GOLD_COLS) + " FROM features_by_stop_line")
    want = [dict(zip(GOLD_COLS, row)) for row in ref_rel.fetchall()]
    assert len(got) == len(want) >= 4
    assert _rows(GOLD_COLS, got) == _rows(GOLD_COLS, want)


def test_event_dashboard_panels_on_e2e_gold(e2e):
    feats, con = e2e["feats"], e2e["con"]
    k = D.compute_kpis(feats)
    n, dep, coal, unus = con.execute("""
        SELECT COUNT(*),
               SUM(CASE WHEN depart_sched_ts IS NOT NULL
                         AND depart_est_ts IS NOT NULL
                    THEN 1 ELSE 0 END),
               100.0 * AVG(CAST(any_coalesce_from_arrival AS DOUBLE)),
               SUM(CASE WHEN sched_ts IS NULL OR est_ts IS NULL
                    THEN 1 ELSE 0 END)
        FROM features_events""").fetchone()
    assert k["rows_total"] == n == 6
    assert k["both_depart_present"] == dep == 5
    assert k["pct_any_coalesce"] == pytest.approx(float(coal))
    assert k["unusable"] == unus == 0
    # the '-' sentinel temp nulls exactly the 08:10-bin rows
    assert k["full_weather_rows"] == 4

    miss = dict(D.missing_values_table(feats, top_n=30))
    assert miss["temp_c"] == pytest.approx(100.0 / 3, abs=0.1)

    coal_tbl = {m: (c, round(p, 4)) for m, c, p in
                D.coalescing_table(feats)}
    assert coal_tbl["any_coalesce_from_arrival"][0] == 1
    assert coal_tbl["both_depart_present"][0] == 5


def test_stop_line_dashboard_panels_on_e2e_gold(e2e):
    gold, con = D.enhance_time(e2e["gold"]), e2e["con"]
    assert D.line_options(gold) == ["12", "14"]
    assert [s for s, _ in D.stop_options(gold, ["14"])] == ["14·8502"]

    view = D.filter_view(gold, lines=["12"], stop_keys=None,
                         date_range=(dt.date(2024, 2, 1),
                                     dt.date(2024, 2, 1)))
    k = D.kpi_row(view)
    trips, avg_d = con.execute("""
        SELECT SUM(n_trips), AVG(delay_avg_min)
        FROM features_by_stop_line
        WHERE line_text = '12' AND CAST(sched_bin AS DATE) = DATE '2024-02-01'
        """).fetchone()
    assert k["trips"] == trips == 3
    assert k["avg_delay_min"] == pytest.approx(float(avg_d))

    ts = D.timeseries(view, "delay_avg_min").collect()
    assert [r.sched_bin for r in ts] == sorted(r.sched_bin for r in ts)
    heat = D.heatmap_hour_dow(gold).collect()
    # 2024-02-01 Thu (dow 3, Monday=0), 2024-02-02 Fri (dow 4)
    assert {r.dow for r in heat} == {3, 4}
    assert all(r.hour in (7, 8) for r in heat)
