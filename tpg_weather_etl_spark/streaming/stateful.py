"""Custom stateful streaming operator: per-key running delay EWMA via
``applyInPandasWithState`` (the Structured Streaming escape hatch for
operators the built-in windowed aggregations can't express — here an
order-sensitive exponential moving average with persistent per-key
state across micro-batches).

State layout per key (line_text): (ewma, n_events, last_ts_micros).
Events inside a batch are applied in event-time order; state persists
in the state store between batches, so the operator is incremental —
each batch touches only arriving keys.

GroupStateTimeout: state expires after ``STATE_TTL_MS`` of key
inactivity measured in EVENT time (``EventTimeTimeout`` + watermark)
— the knob that bounds state-store size on unbounded key spaces.

Why event-time and not processing-time timers (round 14): with
``ProcessingTimeTimeout``, every no-data micro-batch reschedules
another one until wall-clock passes every pending timer —
``FlatMapGroupsWithStateExec.shouldRunAnotherBatch`` is
unconditionally true for processing-time timeouts — so a
``Trigger.AvailableNow`` catch-up run LIVELOCKS in "no new data but
cleaning up state" batches for up to the full TTL (measured: 131
empty batches and counting on a 2-file inbox; the defect hid for
rounds behind a 120s await that silently abandoned the still-running
query and left it contaminating later tests). Event-time timers fire
on watermark advance instead: when the data ends, the watermark
stops moving and the query terminates. They are also
replay-deterministic — a backfill re-run expires exactly the keys
the original run expired, where wall-clock timers would expire
everything older than the replay lag. Same contract as
streaming/anomaly.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([
    T.StructField("ewma", T.DoubleType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("last_ts", T.LongType()),
])

OUTPUT_SCHEMA = T.StructType([
    T.StructField("line_text", T.StringType()),
    T.StructField("ewma_delay_min", T.DoubleType()),
    T.StructField("n_events", T.LongType()),
])

ALPHA = 0.2
STATE_TTL_MS = 3_600_000       # expire a key after 1h event-time gap
# Late-data allowance for the watermark the event-time timers ride on
# (rows later than this past the max seen event time are dropped
# before the operator — the standard watermark contract).
WATERMARK_DELAY = "1 hour"


def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    ewma, n, last_ts = state.get if state.exists else (None, 0, 0)
    for pdf in pdfs:
        pdf = pdf.sort_values("sched_ts")
        # Column-extracted loop, not iterrows (optimization r14, guide
        # §4.3): iterrows builds a pandas Series per row (~55 µs each —
        # measured 11.1 s for a 200k-row key batch, 0.1 s this way).
        # The EWMA recurrence is order-sensitive and stays the same
        # scalar loop with the identical float-op sequence, so the
        # resulting state is bit-identical. datetime64[us] truncation
        # equals the old Timestamp.value // 1000 (ns → µs) for any
        # post-epoch timestamp.
        vals = pdf["delay_min"].to_numpy()
        ts_us = pdf["sched_ts"].to_numpy("datetime64[us]").astype("int64")
        for i in range(len(vals)):
            d = float(vals[i])
            ewma = d if ewma is None else ALPHA * d + (1 - ALPHA) * ewma
            n += 1
            last_ts = max(last_ts, int(ts_us[i]))
    state.update((ewma, n, last_ts))
    # Event-time TTL: anchor on the key's newest event (last_ts is
    # MICROseconds; timers take ms), clamped above the current
    # watermark — Spark rejects a timeout timestamp at or below it
    # (possible for a key whose late rows trail the global watermark).
    anchor_ms = max(last_ts // 1000, state.getCurrentWatermarkMs())
    state.setTimeoutTimestamp(anchor_ms + STATE_TTL_MS)
    yield pd.DataFrame({
        "line_text": [key[0]],
        "ewma_delay_min": [ewma],
        "n_events": [n],
    })


def delay_ewma_by_line(events: DataFrame) -> DataFrame:
    """events (line_text, sched_ts, delay_min) → running EWMA per line.

    Works on a streaming DataFrame (update output mode) — each
    micro-batch emits the refreshed EWMA for keys that received data.
    """
    prepared = events.select(
        "line_text", "sched_ts",
        F.col("delay_min").cast("double").alias("delay_min"),
    ).withWatermark("sched_ts", WATERMARK_DELAY)
    return prepared.groupBy("line_text").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
