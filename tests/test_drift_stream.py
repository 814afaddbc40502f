"""Streaming drift monitor: an in-distribution batch scores low KL,
a template-flooded batch scores high and trips the alert, and a
replayed trigger appends nothing new (offset idempotence)."""

from __future__ import annotations

import json

from tpg_weather_etl_spark.streaming.corpus_dedup import stream_documents
from tpg_weather_etl_spark.streaming.drift_monitor import (

    baseline_from_corpus,
    batch_kl,
    start_drift_monitor,
)
from stream_utils import await_or_fail

WORDS = [f"w{i}" for i in range(30)]


def _doc(doc_id, text, source):
    return json.dumps({"doc_id": doc_id, "text": text, "lang": "en",
                       "source": source, "n_chars": len(text)})


def _ref_corpus(spark):
    rows = [(i, " ".join(WORDS[(i + j) % 30] for j in range(20)),
             "en", f"src{i % 3}", 100) for i in range(60)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")


def test_batch_kl_separates_in_and_off_distribution(spark):
    base = baseline_from_corpus(_ref_corpus(spark))
    good = spark.createDataFrame(
        [(1, " ".join(WORDS[j % 30] for j in range(40)), "en", "web", 1)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    flood = spark.createDataFrame(
        [(2, " ".join(["spamtoken"] * 40), "en", "flood", 1)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    kls = {r.source: r.kl for r in
           batch_kl(good.union(flood), base).collect()}
    assert kls["web"] < 0.1 < kls["flood"]


def test_stream_monitor_alerts_and_is_idempotent(spark, tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    out, ckpt = str(tmp_path / "drift"), str(tmp_path / "ckpt")
    base = baseline_from_corpus(_ref_corpus(spark))

    (inbox / "a.jsonl").write_text("\n".join(
        [_doc(i, " ".join(WORDS[(i + j) % 30] for j in range(20)), "web")
         for i in range(5)]))
    (inbox / "b.jsonl").write_text("\n".join(
        [_doc(100 + i, " ".join(["buynow"] * 20), "flood")
         for i in range(5)]))

    q = start_drift_monitor(
        stream_documents(spark, str(inbox), max_files_per_trigger=1),
        base, out, ckpt)
    await_or_fail(q, 600)

    rows = spark.read.parquet(out).collect()
    by_source = {r.source: r for r in rows}
    assert not by_source["web"].alert
    assert by_source["flood"].alert
    assert by_source["flood"].kl > by_source["web"].kl

    # replayed availableNow trigger: offsets consumed — nothing new
    q2 = start_drift_monitor(
        stream_documents(spark, str(inbox), max_files_per_trigger=1),
        base, out, ckpt)
    await_or_fail(q2, 600)
    assert spark.read.parquet(out).count() == len(rows)

    # crash-replay idempotence: a FRESH checkpoint re-delivers every
    # batch with the same batch_ids (the at-least-once worst case);
    # the batch_id-partitioned dynamic overwrite must leave the sink
    # unchanged rather than appending duplicates.
    q3 = start_drift_monitor(
        stream_documents(spark, str(inbox), max_files_per_trigger=1),
        base, out, str(tmp_path / "ckpt_replay"))
    await_or_fail(q3, 600)
    assert spark.read.parquet(out).count() == len(rows)
