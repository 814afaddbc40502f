"""Scalar "macro" layer — ports of the reference's SQL macros and
inline scalar logic as Catalyst column expressions.

Reference parity map (file:line into /root/reference):
- delay_minutes      src/common.py:208-218
- rain_bin           src/common.py:221-233
- wind_bin           src/common.py:235-246
- temp_bin           src/common.py:248-256
- robust_bool        src/02_ingest_istdaten.py:210-220
- status_rank        src/02_ingest_istdaten.py:263-268
- minute/second diff src/10_build_features.py:211-224 (hazard H5:
  DuckDB date_diff counts *boundary crossings*, so the minute diff is
  floor(unix/60) difference, not a floored duration)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def second_diff(start: Column, end: Column) -> Column:
    """Whole-second difference end-start (DuckDB date_diff('second',…)).

    Second boundaries crossed == difference of epoch seconds, since
    unix_timestamp truncates sub-second parts toward negative infinity
    consistently in both engines for post-epoch data.
    """
    return (F.unix_timestamp(end) - F.unix_timestamp(start)).cast("long")


def minute_diff(start: Column, end: Column) -> Column:
    """Minute *boundary crossings* end-start (hazard H5).

    DuckDB ``date_diff('minute', a, b)`` = number of minute boundaries
    crossed, i.e. floor(epoch(b)/60) - floor(epoch(a)/60). NOT a
    floored duration: 00:00:59 → 00:01:00 is 1 minute here.
    """
    return (
        F.floor(F.unix_timestamp(end) / 60) - F.floor(F.unix_timestamp(start) / 60)
    ).cast("long")


def delay_minutes(est: Column, sched: Column) -> Column:
    """NULL if either side is NULL, else minute-crossing diff as DOUBLE.

    Port of macro ``delay_minutes`` (common.py:208-218).
    """
    return F.when(
        est.isNull() | sched.isNull(), F.lit(None).cast("double")
    ).otherwise(minute_diff(sched, est).cast("double"))


def rain_bin(rain_mm: Column) -> Column:
    """no_rain/drizzle/light/moderate/heavy @ 0/0.5/2/5 (common.py:221-233).

    NULL-propagating: NULL in → NULL out.
    """
    return (
        F.when(rain_mm.isNull(), F.lit(None).cast("string"))
        .when(rain_mm <= 0.0, "no_rain")
        .when(rain_mm < 0.5, "drizzle")
        .when(rain_mm < 2.0, "light")
        .when(rain_mm < 5.0, "moderate")
        .otherwise("heavy")
    )


def wind_bin(wind_ms: Column) -> Column:
    """calm/breeze/moderate/fresh/strong @ 4/8/14/21 m/s (common.py:235-246)."""
    return (
        F.when(wind_ms.isNull(), F.lit(None).cast("string"))
        .when(wind_ms < 4.0, "calm")
        .when(wind_ms < 8.0, "breeze")
        .when(wind_ms < 14.0, "moderate")
        .when(wind_ms < 21.0, "fresh")
        .otherwise("strong")
    )


def temp_bin(temp_c: Column) -> Column:
    """<0 / 0-10 / 10-20 / 20-30 / >=30 °C (common.py:248-256)."""
    return (
        F.when(temp_c.isNull(), F.lit(None).cast("string"))
        .when(temp_c < 0.0, "below_0")
        .when(temp_c < 10.0, "0_10")
        .when(temp_c < 20.0, "10_20")
        .when(temp_c < 30.0, "20_30")
        .otherwise("ge_30")
    )


def robust_bool(raw: Column) -> Column:
    """Trim+lower; {"1","true"}→True; anything else (incl. NULL)→False.

    Port of ``to_bool`` (02_ingest_istdaten.py:210-220). Note the
    asymmetry: unknown garbage and NULL both collapse to False.
    """
    cleaned = F.lower(F.trim(raw))
    return F.when(cleaned.isin("1", "true"), F.lit(True)).otherwise(F.lit(False))


def status_rank(status: Column) -> Column:
    """REAL/IST→3, GESCHAETZT→2, PROGNOSE→1, else (incl NULL)→0.

    Port of the dedupe priority ranking (02_ingest_istdaten.py:263-268).
    """
    up = F.upper(F.coalesce(status, F.lit("")))
    return (
        F.when(up.isin("REAL", "IST"), 3)
        .when(up == "GESCHAETZT", 2)
        .when(up == "PROGNOSE", 1)
        .otherwise(0)
        .cast("int")
    )


def kmh_to_ms(kmh: Column) -> Column:
    """km/h → m/s (03_ingest_weather.py:150-156)."""
    return kmh * (1000.0 / 3600.0)
