"""Structured Streaming ingest: drop files → normalized stream →
watermarked 10-min aggregation → parquet sink (availableNow)."""

from __future__ import annotations

from tpg_weather_etl_spark.schemas import IST_COLMAP
from tpg_weather_etl_spark.streaming.istdaten_stream import (
    stream_delay_features,
    stream_istdaten,
    write_stream_to_parquet,
)

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
    q.awaitTermination(120)
    rows = {(r.sched_bin.minute, r.n_trips, r.n_late_ge2)
            for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert rows == {(0, 2, 1), (10, 1, 0)}
