"""Incremental streaming NEAR-dup dedup: exact dups, in-batch
near-dups, and cross-batch near-dups are all dropped; the band store
grows only with admitted documents."""

from __future__ import annotations

import json

from tpg_weather_etl_spark.streaming.neardup_stream import (
    incremental_neardup,
)

BASE = ("spark merge join window sort hash table scan filter batch "
        "stream vector group query line value key agg row column order")
NEAR_BASE = BASE + " extra"          # superset: Jaccard 18/20 = 0.9
OTHER = ("fast slow big small data customer part dup the a "
         "fast slow big small data customer part dup the a")
NEAR_OTHER = OTHER + " tail"


def _doc(doc_id, text):
    return json.dumps({"doc_id": doc_id, "text": text, "lang": "en",
                       "source": "web", "n_chars": len(text)})


def _run(spark, inbox, out, bands, ckpt):
    q = incremental_neardup(spark, str(inbox), str(out), str(bands),
                            str(ckpt))
    q.awaitTermination(180)


def test_stream_neardup_three_gates(spark, tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    out, bands, ckpt = tmp_path / "corpus", tmp_path / "bands", \
        tmp_path / "ckpt"

    # wave 1: two distinct documents
    (inbox / "a.jsonl").write_text("\n".join([
        _doc(1, BASE),
        _doc(2, OTHER),
    ]))
    _run(spark, inbox, out, bands, ckpt)
    assert {r.doc_id for r in spark.read.parquet(str(out)).collect()} \
        == {1, 2}

    # wave 2, separate trigger run:
    #   3 = near-dup of stored doc 1   → dropped (cross-corpus gate)
    #   4 = exact dup of stored doc 2  → dropped (fp gate)
    #   5 = novel                      → admitted
    #   6 = near-dup of 5, same batch  → dropped (in-batch CC, min id)
    novel = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon")
    (inbox / "b.jsonl").write_text("\n".join([
        _doc(3, NEAR_BASE),
        _doc(4, OTHER),
        _doc(5, novel),
        _doc(6, novel + " phi"),
    ]))
    _run(spark, inbox, out, bands, ckpt)
    got = {r.doc_id for r in spark.read.parquet(str(out)).collect()}
    assert got == {1, 2, 5}

    # the band store covers exactly the admitted documents
    band_docs = {r.doc_id
                 for r in spark.read.parquet(str(bands)).collect()}
    assert band_docs == {1, 2, 5}
