"""Custom stateful streaming operator: per-key running delay EWMA via
``applyInPandasWithState`` (the Structured Streaming escape hatch for
operators the built-in windowed aggregations can't express — here an
order-sensitive exponential moving average with persistent per-key
state across micro-batches).

State layout per key (line_text): (ewma, n_events, last_ts_micros).
Events inside a batch are applied in event-time order; state persists
in the state store between batches, so the operator is incremental —
each batch touches only arriving keys.

GroupStateTimeout: state is kept until ProcessingTimeTimeout expires
it after ``state_ttl_ms`` of key inactivity — the knob that bounds
state-store size on unbounded key spaces.
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


def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    ewma, n, last_ts = state.get if state.exists else (None, 0, 0)
    for pdf in pdfs:
        pdf = pdf.sort_values("sched_ts")
        for _, row in pdf.iterrows():
            d = float(row["delay_min"])
            ewma = d if ewma is None else ALPHA * d + (1 - ALPHA) * ewma
            n += 1
            last_ts = max(last_ts, int(row["sched_ts"].value // 1000))
    state.update((ewma, n, last_ts))
    state.setTimeoutDuration(3_600_000)  # 1h inactivity TTL
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
    )
    return prepared.groupBy("line_text").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
