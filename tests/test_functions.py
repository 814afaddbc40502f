"""Scalar macro layer semantics (reference parity, SURVEY §2.8)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tpg_weather_etl_spark.functions.macros import (
    delay_minutes,
    minute_diff,
    rain_bin,
    robust_bool,
    status_rank,
    temp_bin,
    wind_bin,
)
from tpg_weather_etl_spark.functions.time import dow_monday0, time_bin


def test_robust_bool(spark):
    rows = spark.createDataFrame(
        [("1",), ("true",), (" TRUE ",), ("0",), ("false",), ("garbage",),
         ("",), (None,)], "v string",
    ).select(robust_bool(F.col("v")).alias("b")).collect()
    assert [r.b for r in rows] == [True, True, True, False, False, False,
                                   False, False]


def test_status_rank(spark):
    rows = spark.createDataFrame(
        [("REAL",), ("IST",), ("ist",), ("GESCHAETZT",), ("PROGNOSE",),
         ("UNBEKANNT",), (None,)], "s string",
    ).select(status_rank(F.col("s")).alias("r")).collect()
    assert [r.r for r in rows] == [3, 3, 3, 2, 1, 0, 0]


def test_minute_diff_counts_boundary_crossings(spark):
    # H5: 00:00:59 → 00:01:00 crosses one minute boundary
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0, 0, 59), dt.datetime(2024, 1, 1, 0, 1, 0))],
        "a timestamp, b timestamp",
    )
    assert df.select(minute_diff(F.col("a"), F.col("b")).alias("d")
                     ).collect()[0].d == 1


def test_delay_minutes_null_propagation(spark):
    df = spark.createDataFrame(
        [(None, dt.datetime(2024, 1, 1)), (dt.datetime(2024, 1, 1), None)],
        "est timestamp, sched timestamp",
    )
    out = df.select(delay_minutes(F.col("est"), F.col("sched")).alias("d")
                    ).collect()
    assert all(r.d is None for r in out)


def test_bins_boundaries(spark):
    df = spark.createDataFrame(
        [(0.0,), (0.49,), (0.5,), (4.99,), (5.0,), (None,)], "v double")
    rains = [r[0] for r in df.select(rain_bin(F.col("v"))).collect()]
    assert rains == ["no_rain", "drizzle", "light", "moderate", "heavy", None]
    winds = [r[0] for r in spark.createDataFrame(
        [(3.9,), (4.0,), (13.99,), (21.0,)], "v double"
    ).select(wind_bin(F.col("v"))).collect()]
    assert winds == ["calm", "breeze", "moderate", "strong"]
    temps = [r[0] for r in spark.createDataFrame(
        [(-0.1,), (0.0,), (19.99,), (30.0,)], "v double"
    ).select(temp_bin(F.col("v"))).collect()]
    assert temps == ["below_0", "0_10", "10_20", "ge_30"]


def test_time_bin_edges(spark):
    # events straddling a 10-min boundary: …:09:59 and …:10:00
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 8, 9, 59),),
         (dt.datetime(2024, 1, 1, 8, 10, 0),)], "ts timestamp")
    bins = [r[0] for r in df.select(time_bin(F.col("ts"), 10)).collect()]
    assert bins == [dt.datetime(2024, 1, 1, 8, 0), dt.datetime(2024, 1, 1, 8, 10)]


def test_dow_monday0(spark):
    # 2024-01-01 was a Monday; 2024-01-07 a Sunday (H6)
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1),), (dt.datetime(2024, 1, 7),)],
        "ts timestamp")
    assert [r[0] for r in df.select(dow_monday0(F.col("ts"))).collect()] == [0, 6]
