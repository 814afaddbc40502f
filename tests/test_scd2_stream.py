"""Streaming SCD2 maintenance: incremental == one-shot, replay-safe,
untouched keys untouched."""

from __future__ import annotations

import datetime as dt
from stream_utils import await_or_fail



def _df(spark, rows):
    return spark.createDataFrame(
        rows, "key string, attr string, changed_at timestamp")


def _ts(s):
    return dt.datetime.fromisoformat(s)


B1 = [
    ("A", "x", "2024-01-01T00:00:00"),
    ("B", "y", "2024-01-02T00:00:00"),
]
B2 = [
    ("A", "z", "2024-01-05T00:00:00"),   # attr change → closes x
    ("B", "y", "2024-01-06T00:00:00"),   # same attr → run collapses
    ("C", "w", "2024-01-07T00:00:00"),   # new key
]


def _rows(spark, out):
    return {
        (r.key, r.attr, r.valid_from, r.valid_to)
        for r in spark.read.parquet(out).collect()
    }


def _apply(spark, out, batches):
    from tpg_weather_etl_spark.streaming.scd2_stream import (
        apply_scd2_batch,
    )
    for b in batches:
        rows = [(k, a, _ts(t)) for k, a, t in b]
        apply_scd2_batch(spark, _df(spark, rows), out)


def test_incremental_equals_oneshot_and_replay_safe(spark, tmp_path):
    inc, ref = str(tmp_path / "inc"), str(tmp_path / "ref")
    _apply(spark, inc, [B1, B2])
    _apply(spark, ref, [B1 + B2])
    assert _rows(spark, inc) == _rows(spark, ref)

    want = {
        ("A", "x", _ts("2024-01-01T00:00:00"), _ts("2024-01-05T00:00:00")),
        ("A", "z", _ts("2024-01-05T00:00:00"), None),
        ("B", "y", _ts("2024-01-02T00:00:00"), None),
        ("C", "w", _ts("2024-01-07T00:00:00"), None),
    }
    assert _rows(spark, inc) == want

    # at-least-once replay of the last batch must be a no-op
    _apply(spark, inc, [B2])
    assert _rows(spark, inc) == want


def test_same_instant_conflict_is_deterministic(spark, tmp_path):
    out = str(tmp_path / "t")
    _apply(spark, out, [[("K", "b", "2024-01-01T00:00:00"),
                         ("K", "a", "2024-01-01T00:00:00")]])
    # tie rule: min attr wins
    assert _rows(spark, out) == {
        ("K", "a", _ts("2024-01-01T00:00:00"), None)}


def test_stream_wrapper_end_to_end(spark, tmp_path):
    import pyspark.sql.types as T

    from tpg_weather_etl_spark.streaming.scd2_stream import stream_scd2

    src = tmp_path / "src"
    src.mkdir()
    rows = [(k, a, t) for k, a, t in B1 + B2]
    spark.createDataFrame(
        rows, "key string, attr string, changed_at_s string"
    ).coalesce(1).write.json(str(src / "f1"))

    schema = T.StructType([
        T.StructField("key", T.StringType()),
        T.StructField("attr", T.StringType()),
        T.StructField("changed_at_s", T.StringType()),
    ])
    from pyspark.sql import functions as F
    stream = (spark.readStream.schema(schema).json(str(src / "f1"))
              .select("key", "attr",
                      F.col("changed_at_s").cast("timestamp")
                      .alias("changed_at")))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_scd2(stream, out, ckpt)
    await_or_fail(q, 600)

    ref = str(tmp_path / "ref")
    _apply(spark, ref, [B1 + B2])
    assert _rows(spark, out) == _rows(spark, ref)
