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


def test_event_time_ttl_expires_idle_key_state(spark, tmp_path):
    """Round-14 timer semantics: TTL is EVENT-time inactivity. Key
    "a" goes idle; other keys' data advances the watermark past a's
    timer (last_event + STATE_TTL_MS); the next batch fires the timer
    and removes a's state, so a's eventual fresh point re-baselines
    (n_events restarts at 1) instead of folding into expired history.
    Also pins availableNow termination with PENDING timers: key "b"'s
    timers never expire, yet the query must end when the data does —
    the processing-time-timeout version livelocked here for up to the
    full TTL in no-data "cleaning up state" batches."""
    from tpg_weather_etl_spark.streaming.stateful import STATE_TTL_MS

    assert STATE_TTL_MS == 3_600_000  # 1h; the timeline below assumes it
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    t0 = time.time()
    # b1: a's only early point — timer set to 08:00 + 1h = 09:00
    _write_batch(inbox, "b1.csv", ["a,2024-02-01 08:00:00,1.0"], t0 - 80)
    # b2: b@12:00 -> watermark (delay 1h) becomes 11:00 after b2
    _write_batch(inbox, "b2.csv", ["b,2024-02-01 12:00:00,9.0"], t0 - 60)
    # b3: b again; at b3's start a's 09:00 timer < watermark 11:00 ->
    # hasTimedOut fires for a, state removed
    _write_batch(inbox, "b3.csv", ["b,2024-02-01 12:05:00,9.0"], t0 - 40)
    # b4: a returns — must re-baseline, not fold into removed state
    _write_batch(inbox, "b4.csv", ["a,2024-02-01 12:30:00,5.0"], t0 - 20)

    stream = (
        spark.readStream.schema(
            "line_text string, sched_ts timestamp, delay_min double")
        .option("header", "true")
        .option("maxFilesPerTrigger", 1)
        .csv(str(inbox))
    )
    q = (
        delay_ewma_by_line(stream)
        .writeStream.format("memory").queryName("ewma_ttl_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    await_or_fail(q, 600)
    a_rows = [(r.n_events, round(r.ewma_delay_min, 9)) for r in
              spark.sql("SELECT * FROM ewma_ttl_out "
                        "WHERE line_text = 'a'").collect()]
    # b1's emission plus b4's fresh-baseline emission; a fold into
    # expired state would read (2, 0.2*5 + 0.8*1 = 1.8)
    assert (1, 5.0) in a_rows, a_rows
    assert all(n == 1 for n, _ in a_rows), a_rows
