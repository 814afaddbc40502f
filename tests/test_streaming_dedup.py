"""Incremental streaming corpus dedup: duplicates are dropped both
within a micro-batch and across separately-triggered runs (the
fingerprint store survives restarts because it IS the output)."""

from __future__ import annotations

import json

from tpg_weather_etl_spark.streaming.corpus_dedup import (
    stream_documents,
    write_stream_dedup,
)


def _doc(doc_id, text, source="web"):
    return json.dumps({"doc_id": doc_id, "text": text, "lang": "en",
                       "source": source, "n_chars": len(text)})


def _run_available(spark, inbox, out, ckpt):
    q = write_stream_dedup(
        stream_documents(spark, str(inbox), max_files_per_trigger=1),
        str(out), str(ckpt)).start()
    q.awaitTermination(120)


def test_stream_dedup_in_and_cross_batch(spark, tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    out, ckpt = tmp_path / "corpus", tmp_path / "ckpt"

    # wave 1: "hello world" repeats within the batch (whitespace-
    # normalized dup) — lowest doc_id wins per fingerprint
    (inbox / "a.jsonl").write_text("\n".join([
        _doc(1, "hello world"),
        _doc(2, "hello   WORLD"),      # same fingerprint as doc 1
        _doc(3, "fresh content"),
    ]))
    _run_available(spark, inbox, out, ckpt)
    assert {r.doc_id for r in spark.read.parquet(str(out)).collect()} \
        == {1, 3}

    # wave 1b: separate trigger run — doc 4 duplicates doc 1, which is
    # already in the store (first arrival wins across batches)
    (inbox / "b.jsonl").write_text("\n".join([
        _doc(4, "hello world"),        # cross-batch dup of doc 1
        _doc(5, "another document"),
    ]))
    _run_available(spark, inbox, out, ckpt)
    rows = {r.doc_id: r.fp
            for r in spark.read.parquet(str(out)).collect()}
    assert set(rows) == {1, 3, 5}

    # wave 2: NEW trigger run (restart) — store must persist
    (inbox / "c.jsonl").write_text("\n".join([
        _doc(6, "Hello  World"),       # dup of doc 1 across runs
        _doc(7, "brand new"),
    ]))
    _run_available(spark, inbox, out, ckpt)

    rows = {r.doc_id for r in spark.read.parquet(str(out)).collect()}
    assert rows == {1, 3, 5, 7}
