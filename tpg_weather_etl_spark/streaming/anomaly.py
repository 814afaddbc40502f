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
``STATE_TTL_MS`` of key inactivity in EVENT time
(``EventTimeTimeout`` + watermark), bounding the store on unbounded
key spaces — same contract, and same round-14 rationale, as
streaming/stateful.py: processing-time timers livelock
``Trigger.AvailableNow`` runs (every no-data batch schedules another
until wall-clock passes every pending 1h timer) and expire
non-deterministically under backfill replay; event-time timers fire
on watermark advance and terminate with the data.
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
STATE_TTL_MS = 3_600_000       # 1h event-time inactivity TTL
WATERMARK_DELAY = "1 hour"     # late-data allowance for the timers


def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
    alerts: list[tuple] = []
    last_ms = 0
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        # Column-extracted loop, not iterrows (optimization r14, guide
        # §4.3 "heavyweight per-row machinery"): iterrows materializes
        # a pandas Series PER ROW (~50 µs each — measured 9.2 s for a
        # 200k-row key batch, 0.36 s this way). Welford itself stays
        # the sequential scalar recurrence: each step's float ops and
        # their order are IDENTICAL, so state and alerts are
        # bit-identical; only the row-access machinery changed.
        ts_col = pdf["ts"]
        vals = pdf["value"].to_numpy()
        ts_ns = ts_col.to_numpy("datetime64[ns]").astype("int64")
        for i in range(len(vals)):
            v = float(vals[i])
            last_ms = max(last_ms, int(ts_ns[i]) // 1_000_000)
            # judge against history BEFORE folding the point in
            if n >= MIN_N:
                var = m2 / (n - 1)
                if var > 0.0:
                    z = (v - mean) / math.sqrt(var)
                    if abs(z) > Z_THRESH:
                        alerts.append((key[0], ts_col.iloc[i], v, z, n))
            n += 1
            delta = v - mean
            mean += delta / n
            m2 += delta * (v - mean)
    state.update((n, mean, m2))
    # Event-time TTL anchored on the key's newest arriving event,
    # clamped above the watermark (Spark rejects a timer at or below
    # it — possible when a key's late rows trail the global watermark)
    state.setTimeoutTimestamp(
        max(last_ms, state.getCurrentWatermarkMs()) + STATE_TTL_MS)
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
    ).withWatermark("ts", WATERMARK_DELAY)
    return prepared.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
