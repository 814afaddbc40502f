"""Custom stateful streaming operator: per-key online anomaly
detection via ``applyInPandasWithState`` — Welford running moments in
the state store, z-score alerts in append mode.

Each arriving point is judged against the HISTORY (the state's mean
and variance before the point folds in), then folded in — so a level
shift alerts on its first point instead of first polluting the
baseline. Only alert rows are emitted (append mode); the quiet
majority of the stream produces no output, which is what makes the
operator cheap at scale: state is three numbers per key, output is
alert-sized.

State layout per key: (n, mean, m2) — Welford's algorithm, the
numerically-stable single-pass form (naive Σx/Σx² cancels
catastrophically once mean ≫ std). State expires after
``ProcessingTimeTimeout`` inactivity, bounding the store on
unbounded key spaces (same contract as streaming/stateful.py).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("mean", T.DoubleType()),
    T.StructField("m2", T.DoubleType()),
])

OUTPUT_SCHEMA = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("z", T.DoubleType()),
    T.StructField("n_seen", T.LongType()),
])

Z_THRESH = 4.0
MIN_N = 10          # no alerts until the baseline has this many points
STATE_TTL_MS = 3_600_000


def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
    alerts: list[tuple] = []
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        for _, row in pdf.iterrows():
            v = float(row["value"])
            # judge against history BEFORE folding the point in
            if n >= MIN_N:
                var = m2 / (n - 1)
                if var > 0.0:
                    z = (v - mean) / math.sqrt(var)
                    if abs(z) > Z_THRESH:
                        alerts.append((key[0], row["ts"], v, z, n))
            n += 1
            delta = v - mean
            mean += delta / n
            m2 += delta * (v - mean)
    state.update((n, mean, m2))
    state.setTimeoutDuration(STATE_TTL_MS)
    if alerts:
        yield pd.DataFrame(
            alerts, columns=["key", "ts", "value", "z", "n_seen"])


def anomalies_by_key(events: DataFrame) -> DataFrame:
    """events (key, ts, value) → append-mode stream of z-score alerts.

    Each micro-batch emits only the points whose |z| against the
    running per-key baseline exceeds ``Z_THRESH``; the baseline
    itself lives in the state store and survives batch boundaries.
    """
    prepared = events.select(
        "key", "ts", F.col("value").cast("double").alias("value")
    )
    return prepared.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
