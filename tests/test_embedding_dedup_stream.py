"""Incremental streaming embedding near-dup dedup: replay, in-batch,
and cross-batch semantic dups are all dropped; the bucket store grows
only with admitted vectors and, with the cap on, never grows a
(tbl, bucket) group past the cap even under a same-orthant flood."""

from __future__ import annotations

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from tpg_weather_etl_spark.queries_embeddings import (
    N_PLANES,
    NEARDUP_TABLES,
    buckets_for_embeddings,
)
from tpg_weather_etl_spark.streaming.embedding_dedup import (

    incremental_embedding_dedup,
)
from stream_utils import await_or_fail

DIM = 32
TAU = 0.9


def _vec(vec_id, arr):
    return json.dumps({"vec_id": vec_id,
                       "embedding": [float(x) for x in arr]})


def _basis(j, scale=1.0):
    v = np.zeros(DIM)
    v[j] = scale
    return v


def _run(spark, inbox, out, bkt, ckpt, cap=None):
    q = incremental_embedding_dedup(spark, str(inbox), str(out),
                                    str(bkt), str(ckpt), tau=TAU,
                                    bucket_cap=cap)
    await_or_fail(q, 600)


def _ids(spark, path):
    return {r.vec_id for r in spark.read.parquet(str(path))
            .select("vec_id").collect()}


def test_stream_embedding_three_gates(spark, tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    out, bkt, ckpt = tmp_path / "vecs", tmp_path / "bkt", \
        tmp_path / "ckpt"

    # wave 1: two orthogonal vectors (cos 0 < tau)
    (inbox / "a.jsonl").write_text("\n".join([
        _vec(1, _basis(0)),
        _vec(2, _basis(1)),
    ]))
    _run(spark, inbox, out, bkt, ckpt)
    assert _ids(spark, out) == {1, 2}

    # wave 2, separate trigger run:
    #   3 = near-dup of stored 1 (cos ~0.999) → dropped (cross-corpus)
    #   1 = replay of an already-stored vec_id → absorbed (replay gate)
    #   5 = novel direction                    → admitted
    #   6 = near-dup of 5, same batch          → dropped (in-batch CC,
    #       min id kept)
    near1 = _basis(0) + 0.05 * _basis(5)
    novel = _basis(2)
    near5 = _basis(2) + 0.05 * _basis(6)
    (inbox / "b.jsonl").write_text("\n".join([
        _vec(3, near1),
        _vec(1, _basis(9)),
        _vec(5, novel),
        _vec(6, near5),
    ]))
    _run(spark, inbox, out, bkt, ckpt)
    assert _ids(spark, out) == {1, 2, 5}
    # stored vec 1 kept its ORIGINAL embedding (replay absorbed, not
    # overwritten)
    row = (spark.read.parquet(str(out))
           .filter(F.col("vec_id") == 1).collect())
    assert len(row) == 1 and row[0].embedding[0] == pytest.approx(1.0)
    # bucket store: NEARDUP_TABLES rows per admitted vector, no rows
    # for dropped ones
    b = spark.read.parquet(str(bkt))
    assert _ids(spark, bkt) == {1, 2, 5}
    assert b.count() == 3 * NEARDUP_TABLES


def _weights():
    h = np.arange(NEARDUP_TABLES * N_PLANES)[:, None]
    j = np.arange(DIM)[None, :]
    return ((h * 73 + j * 37 + h * j * 29) % 97) - 48.0


def _table0_buckets(V):
    """Pure-numpy mirror of buckets_for_embeddings, table 0 only —
    float32 storage cast to double before the dot, like the engine."""
    proj = V.astype(np.float32).astype(np.float64) @ _weights().T
    bits = (proj[:, :N_PLANES] > 0).astype(np.int64)
    return bits @ (1 << np.arange(N_PLANES))


def _same_orthant_flood(n_want):
    """Vectors sharing ONE table-0 bucket with pairwise cos < TAU:
    the embedding analogue of the text flood's header-dominant docs
    (bucket collision without semantic duplication)."""
    rng = np.random.default_rng(11)
    V = rng.standard_normal((20000, DIM))
    buckets = _table0_buckets(V)
    vals, counts = np.unique(buckets, return_counts=True)
    hot = vals[np.argmax(counts)]
    group = V[buckets == hot]
    # greedy pairwise-cos filter so the in-batch near-dup gate is inert
    keep = []
    for v in group:
        u = v / np.linalg.norm(v)
        if all(abs(float(u @ w)) < TAU for w in keep):
            keep.append(u)
        if len(keep) == n_want:
            break
    assert len(keep) == n_want, f"only {len(keep)} flood vectors found"
    assert len(set(_table0_buckets(np.array(keep)).tolist())) == 1
    return keep


def test_stream_embedding_bucket_cap_flood(spark, tmp_path):
    cap = 4
    flood = _same_orthant_flood(12)
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    out, bkt, ckpt = tmp_path / "vecs", tmp_path / "bkt", \
        tmp_path / "ckpt"

    # sentinel admitted first through a healthy bucket
    (inbox / "a.jsonl").write_text(_vec(1000, _basis(3)))
    _run(spark, inbox, out, bkt, ckpt, cap=cap)

    # the flood arrives over two separate trigger runs — all admitted
    # (pairwise cos < tau: bucket collision is NOT semantic near-dup)
    (inbox / "b.jsonl").write_text("\n".join(
        _vec(i, v) for i, v in enumerate(flood[:6])))
    _run(spark, inbox, out, bkt, ckpt, cap=cap)
    (inbox / "c.jsonl").write_text("\n".join(
        _vec(6 + i, v) for i, v in enumerate(flood[6:])))
    _run(spark, inbox, out, bkt, ckpt, cap=cap)
    assert _ids(spark, out) == set(range(12)) | {1000}

    # APPEND INVARIANT: no (tbl, bucket) group in the store ever
    # exceeds the cap, however much flood was admitted ...
    b = spark.read.parquet(str(bkt))
    mx = (b.groupBy("tbl", "bucket").count()
          .agg(F.max("count")).collect()[0][0])
    assert mx <= cap
    # ... while re-bucketing the same admitted corpus UNCAPPED
    # overflows it (the flood really was hot)
    uncapped = buckets_for_embeddings(spark.read.parquet(str(out)))
    mx_un = (uncapped.groupBy("tbl", "bucket").count()
             .agg(F.max("count")).collect()[0][0])
    assert mx_un > cap

    # recall through HEALTHY buckets is intact after saturation: a
    # near-dup of the sentinel still dies cross-batch
    (inbox / "d.jsonl").write_text(
        _vec(2000, _basis(3) + 0.05 * _basis(7)))
    _run(spark, inbox, out, bkt, ckpt, cap=cap)
    assert 2000 not in _ids(spark, out)


def test_stream_embedding_auto_cap_flips_on_dense_flood(
        spark, tmp_path):
    """VERDICT r10 item 5, embedding side: with ``auto_cap`` the cap
    starts OFF (benign wave — spread directions, no latch) and the
    first dense-flood batch (≥ BOILER_HOT_SHARE of the batch in one
    LSH bucket) flips it for itself and, durably, for later waves."""
    from tpg_weather_etl_spark.streaming.corpus_dedup import (
        _path_exists,
    )
    from tpg_weather_etl_spark.streaming.embedding_dedup import (
        batch_is_dense_flood,
        incremental_embedding_dedup,
    )

    cap = 4
    flood = _same_orthant_flood(12)
    rng = np.random.default_rng(23)
    benign = []
    for v in rng.standard_normal((4000, DIM)):
        u = v / np.linalg.norm(v)
        if all(abs(float(u @ w)) < TAU for w in benign):
            benign.append(u)
        if len(benign) == 10:
            break

    # fixture sanity via the profile itself (deterministic rng): the
    # benign wave must NOT read as dense, the flood wave must
    def df_of(vecs, base):
        return spark.createDataFrame(
            [(base + i, [float(x) for x in v])
             for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>")
    assert not batch_is_dense_flood(df_of(benign, 0))
    assert batch_is_dense_flood(df_of(flood, 100))

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    out, bkt, ckpt = tmp_path / "vecs", tmp_path / "bkt", \
        tmp_path / "ckpt"
    marker = str(bkt).rstrip("/") + "__capon"

    def run_auto():
        q = incremental_embedding_dedup(
            spark, str(inbox), str(out), str(bkt), str(ckpt),
            tau=TAU, auto_cap=cap)
        await_or_fail(q, 600)

    (inbox / "a.jsonl").write_text("\n".join(
        _vec(i, v) for i, v in enumerate(benign)))
    run_auto()
    assert not _path_exists(spark, marker)
    assert _ids(spark, out) == set(range(10))

    # mid-stream dense flood: latch flips within the batch; the store
    # invariant holds by the END of this same batch
    (inbox / "b.jsonl").write_text("\n".join(
        _vec(100 + i, v) for i, v in enumerate(flood)))
    run_auto()
    assert _path_exists(spark, marker)
    flood_bkt = (spark.read.parquet(str(bkt))
                 .filter(F.col("vec_id") >= 100))
    mx = (flood_bkt.groupBy("tbl", "bucket").count()
          .agg(F.max("count")).collect()[0][0])
    assert mx <= cap
    # uncapped re-bucketing of the admitted flood overflows: the
    # boundedness is the latch's doing
    admitted_flood = (spark.read.parquet(str(out))
                      .filter(F.col("vec_id") >= 100))
    mx_un = (buckets_for_embeddings(admitted_flood)
             .groupBy("tbl", "bucket").count()
             .agg(F.max("count")).collect()[0][0])
    assert mx_un > cap

    # later wave: latch persists even though this batch alone is tiny
    # (2 spread vectors — not a flood); the cap stays on via marker
    extra = []
    for v in rng.standard_normal((4000, DIM)):
        u = v / np.linalg.norm(v)
        if all(abs(float(u @ w)) < TAU for w in benign + flood + extra):
            extra.append(u)
        if len(extra) == 2:
            break
    (inbox / "c.jsonl").write_text("\n".join(
        _vec(500 + i, v) for i, v in enumerate(extra)))
    run_auto()
    assert _path_exists(spark, marker)
    assert {500, 501} <= _ids(spark, out)
