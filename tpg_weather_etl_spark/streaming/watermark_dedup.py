"""Bounded-state streaming dedup via the engine-native
``dropDuplicatesWithinWatermark`` — the transport-level complement to
the store-backed exact dedup in ``streaming/corpus_dedup.py``.

Two dedup contracts exist at scale, and conflating them is the classic
streaming-pipeline bug:

- **Transport dedup** (this module): upstream at-least-once delivery
  (broker replays, producer retries) re-sends the SAME record within a
  bounded delay. ``dropDuplicatesWithinWatermark`` keeps per-key state
  only until the watermark passes the key's event time + delay, so
  state is bounded by keys-per-watermark-window regardless of stream
  lifetime — but a duplicate arriving LATER than the delay is admitted
  again by design.
- **Corpus dedup** (corpus_dedup.py): a document seen in ANY earlier
  micro-batch must never re-enter, forever. That needs a durable
  fingerprint store (the output itself); executor-memory state cannot
  hold it and must not try.

Use this one for replayed-event streams; use the store-backed one for
content-level exactly-once corpora.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_within_watermark(
    events: DataFrame,
    keys: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Drop records whose key was already seen within the watermark
    delay. State for a key is dropped once the watermark passes its
    event time + ``delay`` — bounded memory, late re-sends beyond the
    delay are admitted again (transport-dedup semantics).
    """
    return (
        events.withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(list(keys))
    )
