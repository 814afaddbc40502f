"""Baseline grayscale JPEG through the multimodal decode seam
(VERDICT r9 item 5): a REAL DCT-class decoder — canonical Huffman,
byte unstuffing, restart markers, dequant + inverse zigzag + IDCT —
validated against (a) a hand-assembled golden file produced by
neither the encoder nor the decoder, (b) round-trips from the
independent Annex-K test encoder, and (c) the Arrow-batched Spark
seam with poison payloads."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from jpeg_encoder_ref import encode_gray_jpeg
from tpg_weather_etl_spark.operators.jpeg import (
    decode_gray_jpeg,
    jpeg_decode_features,
)


def _golden_flat_8x8() -> bytes:
    """Hand-assembled minimal baseline JPEG: 8x8, flat mid-gray.
    Custom 1-code Huffman tables (DC cat-0 = '0', AC EOB = '0'), all-
    16 quant table; scan = bits '00' padded with 1s = 0x3F. Written
    from the T.81 spec directly — shares no code with either side."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([16] * 64)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) \
        + b"\x01\x11\x00"
    out += b"\xff\xc4" + struct.pack(">H", 20) + b"\x00" \
        + bytes([1] + [0] * 15) + b"\x00"
    out += b"\xff\xc4" + struct.pack(">H", 20) + b"\x10" \
        + bytes([1] + [0] * 15) + b"\x00"
    out += b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00" \
        + b"\x00\x3f\x00"
    out += bytes([0x3F])
    out += b"\xff\xd9"
    return bytes(out)


def test_golden_hand_assembled_flat():
    w, h, px = decode_gray_jpeg(_golden_flat_8x8())
    assert (w, h) == (8, 8)
    assert px.shape == (8, 8)
    assert np.all(px == 128)
    f = jpeg_decode_features(_golden_flat_8x8())
    assert f[0] == 4.0 and f[3] == pytest.approx(128 / 255)
    assert f[4] == 0.0  # flat image: zero std


def test_roundtrip_smooth_image():
    """Smooth content at the finest Annex-K quantization must survive
    the lossy round-trip within a few gray levels everywhere."""
    yy, xx = np.mgrid[0:32, 0:48]
    img = (128 + 60 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
           ).astype(np.uint8)
    w, h, out = decode_gray_jpeg(encode_gray_jpeg(img))
    assert (w, h) == (48, 32)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 2.5 and err.max() <= 12


def test_roundtrip_odd_dimensions_cropped():
    """Non-multiple-of-8 sizes: encoder pads, decoder must crop back
    to the SOF dimensions exactly."""
    rng = np.random.RandomState(7)
    img = np.clip(rng.randn(13, 9) * 10 + 100, 0, 255).astype(np.uint8)
    w, h, out = decode_gray_jpeg(encode_gray_jpeg(img))
    assert (w, h) == (9, 13) and out.shape == (13, 9)
    # random noise is JPEG's worst case (high-freq energy lands in
    # the coarsest quant bins): bounded, far from exact
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 9


def test_restart_markers_do_not_change_pixels():
    """DRI/RSTn is pure framing: the same image encoded with restart
    every 2 MCUs must decode to the same pixels as without (the
    decoder resets the DC predictor and realigns to the byte)."""
    yy, xx = np.mgrid[0:24, 0:40]
    img = ((xx * 5 + yy * 3) % 256).astype(np.uint8)
    _, _, plain = decode_gray_jpeg(encode_gray_jpeg(img))
    _, _, rst = decode_gray_jpeg(
        encode_gray_jpeg(img, restart_interval=2))
    assert np.array_equal(plain, rst)


def test_byte_stuffing_exercised():
    """A high-contrast image whose entropy stream contains 0xFF bytes
    (stuffed as FF00) must still round-trip; verify stuffing actually
    occurred so the test can't silently pass on tame data."""
    rng = np.random.RandomState(0)
    img = (rng.randint(0, 2, size=(16, 16)) * 255).astype(np.uint8)
    payload = encode_gray_jpeg(img)
    body = payload[2:-2]
    assert b"\xff\x00" in body  # stuffing present in the scan
    w, h, out = decode_gray_jpeg(payload)
    assert (w, h) == (16, 16)
    # harsh quantization on a checkerboard is very lossy; just assert
    # global statistics survive
    assert abs(float(out.mean()) - float(img.mean())) < 40


def test_out_of_scope_and_corrupt_raise_valueerror():
    good = encode_gray_jpeg(
        np.full((8, 8), 200, dtype=np.uint8))
    # progressive: flip SOF0 -> SOF2
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        decode_gray_jpeg(prog)
    with pytest.raises(ValueError):
        decode_gray_jpeg(good[:20])          # truncated pre-SOS
    with pytest.raises(ValueError):
        decode_gray_jpeg(b"\x89PNG\r\n")     # not a JPEG
    with pytest.raises(ValueError):
        jpeg_decode_features(None)


def test_jpeg_through_spark_seam(spark):
    """The production shape: JPEG payloads (with real per-row cost
    variance — flat 8x8 next to 64x48 noise), poison payloads, and
    NULLs through Arrow-batched extract_features; decoded rows carry
    features, poison rows NULL, all media_ids preserved."""
    from tpg_weather_etl_spark.operators.multimodal import (
        extract_features,
        real_decode_features,
    )

    rng = np.random.RandomState(11)
    flat = encode_gray_jpeg(np.full((8, 8), 90, dtype=np.uint8))
    big = encode_gray_jpeg(
        np.clip(rng.randn(48, 64) * 40 + 128, 0, 255).astype(np.uint8))
    rows = [
        (1, "image", flat, "image/jpeg", 8, 8, None),
        (2, "image", big, "image/jpeg", 64, 48, None),
        (3, "image", big[:40], "image/jpeg", 64, 48, None),  # truncated
        (4, "image", b"\xff\xd8garbage", "image/jpeg", None, None, None),
        (5, "image", None, "image/jpeg", None, None, None),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, content binary, mime string, "
              "width int, height int, duration_ms long")
    out = {r.media_id: r for r in
           extract_features(media, decode_fn=real_decode_features)
           .collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    f1, f2 = out[1].feature, out[2].feature
    assert f1[0] == 4.0 and f1[3] == pytest.approx(90 / 255, abs=0.01)
    # feature column is array<float>: float32 round of w/1e4, h/1e4
    assert f2[0] == 4.0
    assert f2[1] == pytest.approx(0.0064, rel=1e-6)
    assert f2[2] == pytest.approx(0.0048, rel=1e-6)
    assert out[3].feature is None and out[4].feature is None
    assert out[5].feature is None and out[5].n_bytes is None


def test_real_decoder_dispatch_all_formats(spark):
    """real_decode_features routes WAV/PPM/GIF/JPEG payloads by magic
    bytes to four REAL decoders in one mapInPandas pass — the mixed-
    corpus shape a 100 TB media table actually has."""
    import io
    import wave as wavmod

    from tpg_weather_etl_spark.operators.multimodal import (
        extract_features,
        real_decode_features,
    )

    buf = io.BytesIO()
    with wavmod.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(8000)
        wv.writeframes(struct.pack("<4h", 0, 1000, 0, -1000))
    wav = buf.getvalue()
    ppm = b"P6\n2 1\n255\n" + bytes([255, 0, 0, 0, 0, 255])
    gif = (b"GIF89a\x01\x00\x01\x00\x80\x00\x00"
           b"\xff\xff\xff\x00\x00\x00"
           b",\x00\x00\x00\x00\x01\x00\x01\x00\x00"
           b"\x02\x02D\x01\x00;")
    jpg = encode_gray_jpeg(np.full((8, 8), 128, dtype=np.uint8))
    media = spark.createDataFrame(
        [(1, "audio", wav, "audio/wav", None, None, 1),
         (2, "image", ppm, "image/ppm", 2, 1, None),
         (3, "image", gif, "image/gif", 1, 1, None),
         (4, "image", jpg, "image/jpeg", 8, 8, None)],
        "media_id long, kind string, content binary, mime string, "
        "width int, height int, duration_ms long")
    tags = {r.media_id: r.feature[0] for r in
            extract_features(media, decode_fn=real_decode_features)
            .collect()}
    assert tags == {1: 1.0, 2: 2.0, 3: 3.0, 4: 4.0}
