"""Structured Streaming ingest: drop files → normalized stream →
watermarked 10-min aggregation → parquet sink (availableNow)."""

from __future__ import annotations

from tpg_weather_etl_spark.schemas import IST_COLMAP
from tpg_weather_etl_spark.streaming.istdaten_stream import (

    stream_delay_features,
    stream_istdaten,
    write_stream_to_parquet,
)
from stream_utils import await_or_fail

IST_HEADER = ";".join(IST_COLMAP.keys())


def _row(fahrt, minute, delay_min):
    sched = f"01.02.2024 08:{minute:02d}:00"
    est = f"01.02.2024 08:{minute + delay_min:02d}:00"
    return ";".join([
        "01.02.2024", fahrt, "TPG", "Bus", "12", "Gare", "8501",
        sched, est, "REAL", sched, est, "REAL", "0", "0", "0",
    ])


def test_stream_istdaten_end_to_end(spark, tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    (inbox / "batch1.csv").write_text(
        "\n".join([IST_HEADER,
                   _row("t1", 0, 3),       # bin 08:00, late
                   _row("t2", 5, 1),       # bin 08:00, on time
                   _row("t2", 5, 1),       # duplicate → dropped
                   _row("t3", 12, 0)]))    # bin 08:10
    # sentinel batches push the watermark past the windows above:
    # wm after batch N = max_event_time(batch N-1) − 30 min
    (inbox / "batch2.csv").write_text(
        "\n".join([IST_HEADER, _row("w1", 55, 0)]))   # 08:55
    (inbox / "batch3.csv").write_text(
        "\n".join([IST_HEADER, _row("w2", 56, 0)]))   # 08:56
    events = stream_istdaten(spark, str(inbox), max_files_per_trigger=1)
    agg = stream_delay_features(events)
    q = write_stream_to_parquet(agg, str(tmp_path / "out"),
                                str(tmp_path / "ckpt")).start()
    await_or_fail(q, 600)
    rows = {(r.sched_bin.minute, r.n_trips, r.n_late_ge2)
            for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert rows == {(0, 2, 1), (10, 1, 0)}


def test_stream_stream_weather_join(spark, tmp_path):
    from tpg_weather_etl_spark.schemas import WEATHER_COLMAP
    from tpg_weather_etl_spark.streaming.istdaten_stream import (
        stream_join_weather,
        stream_weather,
    )

    ev_inbox = tmp_path / "events"
    wx_inbox = tmp_path / "weather"
    ev_inbox.mkdir()
    wx_inbox.mkdir()
    (ev_inbox / "b1.csv").write_text(
        "\n".join([IST_HEADER,
                   _row("t1", 0, 3),      # bin 08:00 → has obs
                   _row("t2", 12, 1),     # bin 08:10 → has obs
                   _row("t3", 25, 0)]))   # bin 08:20 → NO obs, dropped
    wx_header = ";".join(WEATHER_COLMAP.keys())

    def wx_row(hhmm, temp):
        return ";".join(["GVE", f"01.02.2024 {hhmm}", temp, "0.5",
                         "18", "36", "180", "80", "1013", "100",
                         "5", "2"])

    (wx_inbox / "b1.csv").write_text(
        "\n".join([wx_header,
                   wx_row("08:00", "10.0"),
                   wx_row("08:10", "11.5"),
                   wx_row("09:00", "-")]))   # '-' sentinel → NULL temp

    ev = stream_istdaten(spark, str(ev_inbox))
    wx = stream_weather(spark, str(wx_inbox))
    joined = stream_join_weather(ev, wx, station_id="GVE")
    q = write_stream_to_parquet(
        joined.select("fahrt_bezeichner", "sched_bin", "temp_c",
                      "wind_ms"),
        str(tmp_path / "out"), str(tmp_path / "ckpt")).start()
    await_or_fail(q, 600)
    rows = {r.fahrt_bezeichner: r
            for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert set(rows) == {"t1", "t2"}        # inner: t3 has no obs
    assert rows["t1"].temp_c == 10.0
    assert rows["t2"].temp_c == 11.5
    assert rows["t1"].wind_ms == 5.0        # 18 km/h → 5 m/s


def test_stream_upsert_replaces_overlapping_window(spark, tmp_path):
    from tpg_weather_etl_spark.schemas import WEATHER_COLMAP
    from tpg_weather_etl_spark.streaming.istdaten_stream import (
        stream_weather,
        write_stream_upsert,
    )

    wx_header = ";".join(WEATHER_COLMAP.keys())

    def wx_row(hhmm, temp):
        return ";".join(["GVE", f"01.02.2024 {hhmm}", temp, "0.5",
                         "18", "36", "180", "80", "1013", "100",
                         "5", "2"])

    inbox = tmp_path / "wx"
    inbox.mkdir()
    target = str(tmp_path / "gold")

    # batch 1: two observations
    (inbox / "b1.csv").write_text(
        "\n".join([wx_header, wx_row("08:00", "10.0"),
                   wx_row("08:10", "11.0")]))
    q = write_stream_upsert(
        stream_weather(spark, str(inbox)), target,
        str(tmp_path / "ck1")).start()
    await_or_fail(q, 600)
    first = spark.read.parquet(target).select("ts_utc", "temp_c").collect()
    assert len(first) == 2

    # batch 2: REVISED 08:10 obs plus a new 08:20 one — the upsert
    # must replace the overlapping [08:10, 08:20] window, not append.
    # Same checkpoint → the resumed stream processes only the new file.
    (inbox / "b2.csv").write_text(
        "\n".join([wx_header, wx_row("08:10", "99.0"),
                   wx_row("08:20", "12.0")]))
    q2 = write_stream_upsert(
        stream_weather(spark, str(inbox)), target,
        str(tmp_path / "ck1")).start()
    await_or_fail(q2, 600)

    rows = {r.ts_utc.strftime("%H:%M"): r.temp_c
            for r in spark.read.parquet(target).collect()}
    assert len(rows) == 3                      # no duplicate 08:10
    assert rows["08:10"] == 99.0               # revised value won
    assert rows["08:00"] == 10.0
    assert rows["08:20"] == 12.0


def test_stream_session_windows_merge_and_close(spark, tmp_path):
    from tpg_weather_etl_spark.streaming.istdaten_stream import (
        stream_trip_sessions,
    )

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    # trip t1: stops at 08:00, 08:10 (merge: gap 10 < 15) then 08:40
    # (new session: gap 30 > 15); trip t2: one stop
    (inbox / "b1.csv").write_text(
        "\n".join([IST_HEADER,
                   _row("t1", 0, 2), _row("t1", 10, 4),
                   _row("t1", 40, 0), _row("t2", 5, 1)]))
    # sentinel batches at 09:30/09:35 advance the watermark (max-30min)
    # past every session end (t1@08:40 closes at 08:55) so they emit
    def sentinel(fahrt, hhmm):
        ts = f"01.02.2024 {hhmm}"
        return ";".join(["01.02.2024", fahrt, "TPG", "Bus", "12", "Gare",
                         "8501", ts, ts, "REAL", ts, ts, "REAL",
                         "0", "0", "0"])
    (inbox / "b2.csv").write_text(
        "\n".join([IST_HEADER, sentinel("w1", "09:30:00")]))
    (inbox / "b3.csv").write_text(
        "\n".join([IST_HEADER, sentinel("w2", "09:35:00")]))
    # FileStreamSource orders files by modification time; same-second
    # writes tie and can batch the watermark sentinels BEFORE the data
    # (making every data row late) — pin ascending mtimes explicitly
    import os as _os
    for i, f in enumerate(["b1.csv", "b2.csv", "b3.csv"]):
        _os.utime(inbox / f, (1000 + i, 1000 + i))
    events = stream_istdaten(spark, str(inbox), max_files_per_trigger=1)
    q = write_stream_to_parquet(
        stream_trip_sessions(events), str(tmp_path / "out"),
        str(tmp_path / "ckpt")).start()
    await_or_fail(q, 600)
    rows = {(r.fahrt_bezeichner, r.s_start.minute, r.n_stops,
             r.max_delay_sec)
            for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert ("t1", 0, 2, 240) in rows      # 08:00+08:10 merged, max 4 min
    assert ("t1", 40, 1, 0) in rows       # 08:40 separate session
    assert ("t2", 5, 1, 60) in rows


def test_stream_rerun_same_checkpoint_is_exactly_once(spark, tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    (inbox / "b1.csv").write_text(
        "\n".join([IST_HEADER, _row("t1", 0, 3), _row("t2", 5, 1)]))
    (inbox / "b2.csv").write_text("\n".join([IST_HEADER, _row("w1", 55, 0)]))
    (inbox / "b3.csv").write_text("\n".join([IST_HEADER, _row("w2", 59, 0)]))
    import os as _os
    for i, f in enumerate(["b1.csv", "b2.csv", "b3.csv"]):
        _os.utime(inbox / f, (1000 + i, 1000 + i))

    def run():
        ev = stream_istdaten(spark, str(inbox), max_files_per_trigger=1)
        q = write_stream_to_parquet(
            stream_delay_features(ev), str(tmp_path / "out"),
            str(tmp_path / "ckpt")).start()
        await_or_fail(q, 600)
        return spark.read.parquet(str(tmp_path / "out")).count()

    n1 = run()
    assert n1 >= 1
    # second run, same checkpoint, no new input → no duplicate output
    n2 = run()
    assert n2 == n1


def test_stream_static_dim_enrichment(spark, tmp_path):
    # stream side: a small file-source stream; static side: a dim
    # table. The streaming result must equal the batch join, and the
    # plan must not create a state store (no stateful operator).
    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    from tpg_weather_etl_spark.streaming.istdaten_stream import (
        stream_enrich_dim,
    )

    src = tmp_path / "src"
    src.mkdir()
    batch = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        "id long, k string, v double")
    batch.coalesce(1).write.json(str(src / "f1"))
    dim = spark.createDataFrame(
        [("a", "alpha"), ("b", "beta")], "k string, name string")

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("k", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ])
    stream = spark.readStream.schema(schema).json(str(src / "f1"))
    out = stream_enrich_dim(stream, dim, "k")
    q = (out.writeStream.format("memory").queryName("enriched")
         .trigger(availableNow=True).start())
    await_or_fail(q, 600)

    got = {tuple(r) for r in spark.sql(
        "SELECT id, k, v, name FROM enriched").collect()}
    want = {tuple(r) for r in
            batch.join(F.broadcast(dim), "k", "left")
            .select("id", "k", "v", "name").collect()}
    assert got == want
    # stateless: no state-store operator in the last progress
    prog = q.lastProgress
    assert prog is None or not prog.get("stateOperators"), prog
