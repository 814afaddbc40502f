"""applyInPandasWithState EWMA: state persists across micro-batches."""

from __future__ import annotations

import time

from tpg_weather_etl_spark.streaming.stateful import ALPHA, delay_ewma_by_line
from stream_utils import await_or_fail



def _write_batch(inbox, name, rows, mtime):
    p = inbox / name
    p.write_text("\n".join(["line_text,sched_ts,delay_min"] + rows))
    # the file source orders batches by modification time; same-second
    # mtimes make batch order nondeterministic → pin them explicitly
    import os
    os.utime(p, (mtime, mtime))


def test_ewma_state_across_batches(spark, tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    t0 = time.time()
    _write_batch(inbox, "b1.csv", ["12,2024-02-01 08:00:00,1.0",
                                   "12,2024-02-01 08:05:00,2.0"], t0 - 60)
    _write_batch(inbox, "b2.csv", ["12,2024-02-01 08:10:00,3.0"], t0 - 30)

    stream = (
        spark.readStream.schema(
            "line_text string, sched_ts timestamp, delay_min double")
        .option("header", "true")
        .option("maxFilesPerTrigger", 1)
        .csv(str(inbox))
    )
    out = delay_ewma_by_line(stream)
    q = (
        out.writeStream.format("memory").queryName("ewma_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    await_or_fail(q, 600)
    rows = spark.sql(
        "SELECT * FROM ewma_out ORDER BY n_events").collect()
    # batch 1: ewma = a*2 + (1-a)*1 ; batch 2 folds 3.0 on top of state
    e1 = ALPHA * 2.0 + (1 - ALPHA) * 1.0
    e2 = ALPHA * 3.0 + (1 - ALPHA) * e1
    got = {(r.n_events): round(r.ewma_delay_min, 9) for r in rows}
    assert got[2] == round(e1, 9)
    assert got[3] == round(e2, 9)  # state survived the batch boundary
