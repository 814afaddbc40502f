"""Time-grid and calendar feature expressions.

Reference parity:
- time_bin    10-min floor bin, src/10_build_features.py:227-232
- month_key   strftime('%Y-%m'), src/02_ingest_istdaten.py:443
- dow_monday0 pandas .dt.dayofweek convention (hazard H6: Spark
  dayofweek() is 1=Sunday; pandas/reference is 0=Monday)
- cyclic sin/cos hour encodes, DDL src/common.py:189
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(c: Column) -> Column:
    """Microseconds since epoch, tolerant of TIMESTAMP_NTZ inputs.

    ``F.unix_micros`` is strictly typed: it rejects ``TIMESTAMP_NTZ``
    columns (which pyspark >= 4 produces when reading timezone-less
    parquet ``timestamp[us]`` with NTZ inference enabled) with
    DATATYPE_MISMATCH at analysis time. The engine pins the session
    timezone to UTC (session.py, hazard H1 — the reference stores
    naive-UTC timestamps, 03_ingest_weather.py:138), so casting
    NTZ → TIMESTAMP is lossless and this helper is exact for both
    timestamp flavors. Use this, never raw ``unix_micros``, on any
    column that may originate from parquet.
    """
    return F.unix_micros(c.cast("timestamp"))


def time_bin(ts: Column, minutes: int = 10) -> Column:
    """Floor ``ts`` onto a fixed minute grid (default 10 minutes).

    Equivalent to the reference's epoch-minute arithmetic
    (10_build_features.py:227-232) and to
    ``F.window(ts, f"{minutes} minutes").start`` — expressed as epoch
    math so it stays a scalar expression (window() forces a struct).
    """
    secs = minutes * 60
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(ts) / secs).cast("long") * secs
    )


def month_key(d: Column) -> Column:
    """'YYYY-MM' month key (02_ingest_istdaten.py:443, 483)."""
    return F.date_format(d, "yyyy-MM")


def dow_monday0(ts: Column) -> Column:
    """Day-of-week with Monday=0 .. Sunday=6 (pandas convention, H6)."""
    return ((F.dayofweek(ts) + 5) % 7).cast("int")


def cyclic_hour_sin(hour: Column) -> Column:
    """sin(2π·hour/24) cyclic encode (DDL common.py:189)."""
    return F.sin(hour.cast("double") * (2.0 * math.pi / 24.0))


def cyclic_hour_cos(hour: Column) -> Column:
    """cos(2π·hour/24) cyclic encode (DDL common.py:189)."""
    return F.cos(hour.cast("double") * (2.0 * math.pi / 24.0))
