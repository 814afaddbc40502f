"""Multimodal plumbing: binary payloads through Arrow-batched
mapInPandas, poison-payload isolation, metadata-only pruning."""

from __future__ import annotations

from tpg_weather_etl_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    fake_decode_features,
    metadata_stats,
    resize_stub,
)


def _media_df(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes", "image/png", 640, 480, None),
        (2, "image", b"tiny", "image/png", 100, 80, None),
        (3, "audio", b"RIFF fake wav", "audio/wav", None, None, 1500),
        (4, "video", None, "video/mp4", 1920, 1080, 60000),  # null payload
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_batched(spark):
    out = {r.media_id: r for r in extract_features(_media_df(spark)).collect()}
    assert out[1].n_bytes == 15
    assert len(out[1].feature) == 8
    assert all(0.0 <= v <= 1.0 for v in out[1].feature)
    # determinism
    again = {r.media_id: r for r in extract_features(_media_df(spark)).collect()}
    assert out[1].feature == again[1].feature
    # null payload → NULL feature, row survives
    assert out[4].feature is None and out[4].n_bytes is None


def test_poison_payload_isolated(spark):
    def bomb(content):
        raise RuntimeError("decoder crash")
    out = extract_features(_media_df(spark), decode_fn=bomb).collect()
    assert len(out) == 4
    assert all(r.feature is None for r in out)


def test_metadata_stats_and_resize_flag(spark):
    stats = {r.kind: r for r in metadata_stats(_media_df(spark)).collect()}
    assert stats["image"].n == 2
    flags = {r.media_id: r.needs_resize
             for r in resize_stub(_media_df(spark)).collect()}
    assert flags == {1: True, 2: False, 3: False, 4: False}


def test_fake_decoder_is_deterministic():
    assert fake_decode_features(b"abc") == fake_decode_features(b"abc")
    assert fake_decode_features(b"abc") != fake_decode_features(b"abd")
