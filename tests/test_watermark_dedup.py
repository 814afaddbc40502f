"""dropDuplicatesWithinWatermark semantics: replays within the delay
are dropped; state expires with the watermark so a re-send after the
delay is admitted again (bounded-state transport dedup, NOT corpus
dedup — the contrast documented in streaming/watermark_dedup.py)."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from tpg_weather_etl_spark.streaming.watermark_dedup import (

    dedup_within_watermark,
)
from stream_utils import await_or_fail

SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("user_id", T.LongType(), True),
])


def _ev(event_id, hhmm, user_id=1):
    return json.dumps({"event_id": event_id,
                       "ts": f"2024-02-01T{hhmm}:00.000Z",
                       "user_id": user_id})


def test_dedup_within_watermark_drops_replays_and_expires(spark, tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    # batch 1: event 1 plus an in-batch replay; event 2.
    (inbox / "b1.json").write_text("\n".join([
        _ev(1, "08:00"), _ev(1, "08:01"), _ev(2, "08:02")]))
    # batch 2: a cross-batch replay of event 1 while its state is
    # alive (wm after b1 = 08:02 − 10 min), plus a sentinel far ahead
    # that pushes the watermark past every earlier key's expiry.
    (inbox / "b2.json").write_text("\n".join([
        _ev(1, "08:03"), _ev(99, "09:00")]))
    # batch 3: sentinel only. State eviction is LAZY — an expired key
    # still dedups during the batch in which it is evicted (the lookup
    # runs before eviction), so one batch must pass between the
    # watermark crossing key 1's expiry and its re-send.
    (inbox / "b3.json").write_text(_ev(50, "09:02"))
    # batch 4: event 1 again, after its state was evicted — admitted
    # (transport-dedup semantics: beyond-delay re-sends come back).
    (inbox / "b4.json").write_text(_ev(1, "09:05"))
    # the file source orders batches by modification time; same-second
    # writes would make batch order (and thus watermark advancement)
    # nondeterministic
    import os
    for i, f in enumerate(["b1.json", "b2.json", "b3.json", "b4.json"]):
        os.utime(inbox / f, (1_700_000_000 + i * 10,) * 2)

    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .json(str(inbox)))
    deduped = dedup_within_watermark(
        stream, keys=("event_id",), ts_col="ts", delay="10 minutes")
    q = (deduped.writeStream.format("parquet")
         .option("path", str(tmp_path / "out"))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    await_or_fail(q, 600)

    rows = sorted((r.event_id, r.ts.strftime("%H:%M"))
                  for r in spark.read.parquet(str(tmp_path / "out")).collect())
    assert rows == [
        (1, "08:00"),   # first sighting kept (08:01/08:03 replays dropped)
        (1, "09:05"),   # re-send after state eviction admitted again
        (2, "08:02"),
        (50, "09:02"),
        (99, "09:00"),
    ]
