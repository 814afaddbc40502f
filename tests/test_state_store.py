"""RocksDB state-store provider: parity + genuine engagement.

The provider swap (streaming/state_store.py) is the 100 TB state
knob — heap-backed state OOMs at training-corpus key cardinality.
Provider choice must be output-invariant: the state store is a
storage engine under the SAME operator semantics, so the EWMA
stream must produce byte-identical results on RocksDB as on the
heap default (the values test_stateful_streaming pins). The test
also asserts the query REALLY ran on RocksDB (rocksdb* custom
metrics in the state operator's progress) — a silently-ignored
conf would make this a vacuous parity claim.
"""

from __future__ import annotations

import time

from tpg_weather_etl_spark.streaming.stateful import ALPHA, delay_ewma_by_line
from tpg_weather_etl_spark.streaming.state_store import (
    DEFAULT_PROVIDER,
    ROCKSDB_PROVIDER,
    current_provider,
    use_default_state_store,
    use_rocksdb_state_store,
)
from stream_utils import await_or_fail


def _write_batch(inbox, name, rows, mtime):
    import os
    p = inbox / name
    p.write_text("\n".join(["line_text,sched_ts,delay_min"] + rows))
    os.utime(p, (mtime, mtime))


def test_rocksdb_state_store_parity_and_engagement(spark, tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    t0 = time.time()
    _write_batch(inbox, "b1.csv", ["12,2024-02-01 08:00:00,1.0",
                                   "12,2024-02-01 08:05:00,2.0"], t0 - 60)
    _write_batch(inbox, "b2.csv", ["12,2024-02-01 08:10:00,3.0"], t0 - 30)

    use_rocksdb_state_store(spark, bounded_memory_mb=512)
    try:
        assert current_provider(spark) == ROCKSDB_PROVIDER
        stream = (
            spark.readStream.schema(
                "line_text string, sched_ts timestamp, delay_min double")
            .option("header", "true")
            .option("maxFilesPerTrigger", 1)
            .csv(str(inbox))
        )
        q = (
            delay_ewma_by_line(stream)
            .writeStream.format("memory").queryName("ewma_rocks_out")
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        await_or_fail(q, 600)
        progress = q.lastProgress
    finally:
        use_default_state_store(spark)
    assert current_provider(spark) == DEFAULT_PROVIDER

    # Parity: same EWMA fold across the same batch boundary as the
    # heap-provider test pins.
    e1 = ALPHA * 2.0 + (1 - ALPHA) * 1.0
    e2 = ALPHA * 3.0 + (1 - ALPHA) * e1
    rows = spark.sql(
        "SELECT * FROM ewma_rocks_out ORDER BY n_events").collect()
    got = {r.n_events: round(r.ewma_delay_min, 9) for r in rows}
    assert got[2] == round(e1, 9)
    assert got[3] == round(e2, 9)

    # Engagement: the state operator's progress carries RocksDB
    # custom metrics only when the RocksDB provider actually backed
    # the store.
    ops = (progress or {}).get("stateOperators") or []
    assert ops, f"no state operator in progress: {progress}"
    metrics = ops[0].get("customMetrics") or {}
    rocks_keys = [k for k in metrics if k.lower().startswith("rocksdb")]
    assert rocks_keys, f"no rocksdb metrics — provider ignored? {metrics}"
