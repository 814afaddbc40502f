"""Stateful streaming anomaly detector: baseline builds across
micro-batches, alerts fire against history, quiet data emits nothing."""

from __future__ import annotations

import time

from tpg_weather_etl_spark.streaming.anomaly import (

    MIN_N,
    Z_THRESH,
    anomalies_by_key,
)
from stream_utils import await_or_fail


def _write_batch(inbox, name, rows, mtime):
    import os

    p = inbox / name
    p.write_text("\n".join(["key,ts,value"] + rows))
    os.utime(p, (mtime, mtime))


def test_anomaly_alert_fires_against_cross_batch_baseline(spark, tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    t0 = time.time()
    # batch 1: a clean baseline for key "a" (values 10.0, 10.1, ... —
    # nonzero variance, MIN_N+2 points), plus a second key "b" whose
    # history stays constant (variance 0 → never alerts)
    base = [
        f"a,2024-02-01 08:{i:02d}:00,{10.0 + (i % 3) * 0.1}"
        for i in range(MIN_N + 2)
    ]
    base += [f"b,2024-02-01 08:{i:02d}:00,5.0" for i in range(MIN_N + 2)]
    _write_batch(inbox, "b1.csv", base, t0 - 60)
    # batch 2: an obvious outlier for "a", a normal point for "a",
    # and another constant point for "b"
    _write_batch(inbox, "b2.csv", [
        "a,2024-02-01 09:00:00,100.0",
        "a,2024-02-01 09:01:00,10.1",
        "b,2024-02-01 09:00:00,5.0",
    ], t0 - 30)

    stream = (
        spark.readStream.schema("key string, ts timestamp, value double")
        .option("header", "true")
        .option("maxFilesPerTrigger", 1)
        .csv(str(inbox))
    )
    q = (
        anomalies_by_key(stream)
        .writeStream.format("memory").queryName("anom_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    await_or_fail(q, 600)
    rows = spark.sql("SELECT * FROM anom_out").collect()
    # exactly one alert: the outlier, judged against the batch-1
    # baseline that survived in the state store
    assert len(rows) == 1
    r = rows[0]
    assert r.key == "a"
    assert r.value == 100.0
    assert abs(r.z) > Z_THRESH
    assert r.n_seen >= MIN_N
