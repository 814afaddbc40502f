"""Multimodal plumbing: binary payloads through Arrow-batched
mapInPandas, poison-payload isolation, metadata-only pruning."""

from __future__ import annotations

import pytest

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


def _golden_wav(freq_frames=100, rate=8000, amp=12000):
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = b"".join(
            struct.pack("<h", int(amp * math.sin(2 * math.pi * i / 20)))
            for i in range(freq_frames))
        w.writeframes(frames)
    return buf.getvalue()


def _golden_ppm(w=4, h=2):
    # 4x2 image: left half pure red, right half pure blue
    px = bytearray()
    for _ in range(h):
        for x in range(w):
            px += bytes([255, 0, 0] if x < w // 2 else [0, 0, 255])
    return b"P6\n%d %d\n255\n" % (w, h) + bytes(px)


def test_stdlib_decoder_golden_bytes(spark):
    from tpg_weather_etl_spark.operators.multimodal import (
        stdlib_decode_features,
    )

    wav = stdlib_decode_features(_golden_wav())
    assert wav[0] == 1.0          # format tag: WAV
    assert wav[1] == 1.0          # mono
    assert wav[2] == pytest.approx(0.08)       # 8 kHz
    assert wav[3] == pytest.approx(100 / 8000)  # duration
    assert 0.0 < wav[4] < wav[5] <= 1.0         # rms < peak, normalized

    ppm = stdlib_decode_features(_golden_ppm())
    assert ppm[0] == 2.0          # format tag: PPM
    assert ppm[1] == pytest.approx(4 / 1e4)
    assert ppm[2] == pytest.approx(2 / 1e4)
    assert ppm[3] == pytest.approx(0.5)  # half the pixels fully red
    assert ppm[4] == 0.0
    assert ppm[5] == pytest.approx(0.5)

    with pytest.raises(ValueError):
        stdlib_decode_features(b"\xff\xd8\xff JPEG-ish garbage")


def test_stdlib_decoder_through_spark_seam(spark):
    # the REAL decoder rides the same mapInPandas seam as the stub:
    # WAV + PPM rows decode, an undecodable payload yields NULL
    rows = [(1, "audio", _golden_wav(), "audio/wav", None, None, 13),
            (2, "image", _golden_ppm(), "image/x-portable-pixmap",
             4, 2, None),
            (3, "video", b"\x00\x01undecodable", "video/mp4",
             None, None, 99)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    from tpg_weather_etl_spark.operators.multimodal import (
        stdlib_decode_features,
    )
    out = {r.media_id: r for r in
           extract_features(media,
                            decode_fn=stdlib_decode_features).collect()}
    assert out[1].feature[0] == 1.0
    assert out[2].feature[0] == 2.0
    assert out[3].feature is None and out[3].n_bytes == 13


def test_sample_frames_rawv(spark):
    from tpg_weather_etl_spark.operators.multimodal import (
        pack_rawv, sample_frames,
    )

    w, h = 4, 2
    def frame(v):
        return bytes([v]) * (w * h * 3)

    vids = [
        (1, pack_rawv(w, h, [frame(10), frame(20), frame(30),
                             frame(40), frame(50)])),
        (2, pack_rawv(w, h, [frame(100)])),
        (3, b"not a video"),                       # skipped
        (4, pack_rawv(w, h, [frame(1)])[:-5]),     # truncated → skipped
        (5, None),                                 # null → skipped
    ]
    df = spark.createDataFrame(vids, "media_id long, content binary")
    rows = sample_frames(df, every_k=2).collect()
    got = {(r.media_id, r.frame_idx): r for r in rows}
    # video 1: frames 0,2,4 sampled of 5; video 2: frame 0 of 1
    assert set(got) == {(1, 0), (1, 2), (1, 4), (2, 0)}
    assert got[(1, 0)].mean_intensity == 10.0
    assert got[(1, 2)].mean_intensity == 30.0
    assert got[(1, 4)].n_frames == 5
    assert len(got[(2, 0)].frame) == w * h * 3


def test_resize_ppm_downsamples_and_passes_through(spark):
    from tpg_weather_etl_spark.operators.multimodal import resize_ppm

    def ppm(w, h, val):
        return b"P6\n%d %d\n255\n" % (w, h) + bytes([val]) * (w * h * 3)

    rows = [
        (1, ppm(512, 256, 7)),     # downsample → 256x128
        (2, ppm(16, 8, 9)),        # small → untouched
        (3, b"GIF89a not ppm"),    # foreign format → pass-through
        (4, None),                 # null → pass-through
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r.media_id: r for r in resize_ppm(df, max_px=256).collect()}
    assert got[1].resized and (got[1].width, got[1].height) == (256, 128)
    assert got[1].content.startswith(b"P6\n256 128\n255\n")
    # pixel payload is exactly the downsampled size, values preserved
    body = bytes(got[1].content).split(b"\n", 3)[3]
    assert len(body) == 256 * 128 * 3 and set(body) == {7}
    assert not got[2].resized and got[2].width == 16
    assert not got[3].resized and got[3].width is None
    assert bytes(got[3].content) == b"GIF89a not ppm"
    assert not got[4].resized and got[4].content is None


def test_read_media_dir_binary_source_to_decode(spark, tmp_path):
    """binaryFile ingestion edge: files on disk → MEDIA_SCHEMA →
    stdlib decode, end-to-end. Glob pruning keeps junk out at listing
    time and the poison payload flows to a NULL feature, not a task
    failure."""
    import struct
    import wave as wave_mod
    import io

    from tpg_weather_etl_spark.operators.multimodal import (
        extract_features,
        stdlib_decode_features,
    )
    from tpg_weather_etl_spark.sources.readers import read_media_dir

    (tmp_path / "nested").mkdir()
    # a valid 8-frame mono WAV
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<8h", *([1000, -1000] * 4)))
    (tmp_path / "nested" / "a.wav").write_bytes(buf.getvalue())
    # a valid 2x2 PPM
    (tmp_path / "b.ppm").write_bytes(b"P6\n2 2\n255\n" + bytes(12))
    # a poison payload with a media extension, and junk to glob away
    (tmp_path / "c.wav").write_bytes(b"not really audio")
    (tmp_path / "notes.txt").write_bytes(b"ignore me")

    media = read_media_dir(spark, tmp_path, pattern="*.{wav,ppm}")
    rows = {r.kind: r for r in media.collect()}
    assert set(rows) == {"audio", "image"}
    assert media.count() == 3  # txt pruned at listing time

    feats = extract_features(media, decode_fn=stdlib_decode_features)
    out = feats.collect()
    ok = [r for r in out if r.feature is not None]
    bad = [r for r in out if r.feature is None]
    assert len(ok) == 2 and len(bad) == 1  # poison → NULL, no crash
    kinds = {r.kind: r.feature for r in ok}
    assert kinds["audio"][0] == 1.0 and kinds["audio"][1] == 1.0
    assert kinds["image"][0] == 2.0
    # media_id is stable across re-reads of the same paths
    again = {r.media_id for r in
             read_media_dir(spark, tmp_path, "*.{wav,ppm}").collect()}
    assert again == {r.media_id for r in media.collect()}


# ---------------------------------------------------------------------------
# GIF / LZW: a real entropy-coded format through the decode_fn seam
# (VERDICT r8 item 6). The encoder below is a full dictionary-building
# LZW encoder written ONLY here (the package ships the decoder), so
# the round-trip genuinely exercises variable code widths, dictionary
# growth, the cScSc self-reference case, and sub-block chaining.
# ---------------------------------------------------------------------------

def _lzw_encode(indices, min_code_size):
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    code_size = min_code_size + 1
    bits = bytearray()
    acc = nacc = 0

    def emit(code):
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += code_size
        while nacc >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    w = (indices[0],)
    for k in indices[1:]:
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # encoder widens one step ahead of the decoder's
            # next_code (the decoder lags one table entry)
            if next_code >= (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        w = (k,)
    emit(table[w])
    emit(end)
    if nacc:
        bits.append(acc & 0xFF)
    return bytes(bits)


def _make_gif(w, h, palette, indices, min_code_size=None):
    import struct
    bits = max(1, (len(palette) - 1).bit_length())
    table = list(palette) + [(0, 0, 0)] * ((1 << bits) - len(palette))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    for r, g, b in table:
        out += bytes((r, g, b))
    # graphic-control extension: exercises the extension-skip path
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    mcs = min_code_size or max(2, bits)
    out += bytes([mcs])
    data = _lzw_encode(indices, mcs)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_golden_1x1():
    """The canonical 35-byte 1x1 white GIF89a — hand-assembled bytes,
    NOT produced by the test encoder, so decoder and encoder can't
    share a wrong spec reading."""
    from tpg_weather_etl_spark.operators.multimodal import (
        gif_decode_features,
    )
    golden = (b"GIF89a\x01\x00\x01\x00\x80\x00\x00"
              b"\xff\xff\xff\x00\x00\x00"
              b",\x00\x00\x00\x00\x01\x00\x01\x00\x00"
              b"\x02\x02D\x01\x00;")
    f = gif_decode_features(golden)
    assert f == [3.0, 0.0001, 0.0001, 1.0, 1.0, 1.0]


def test_gif_lzw_roundtrip_with_dictionary_growth():
    import random

    from tpg_weather_etl_spark.operators.multimodal import (
        _lzw_decode,
        gif_decode_features,
    )

    rng = random.Random(9)
    # 64x48 4-color image with long runs and repeated tiles: the LZW
    # table grows through several code widths (well past 9 bits)
    w, h = 64, 48
    indices = []
    while len(indices) < w * h:
        indices.extend([rng.randrange(4)] * rng.randrange(1, 20))
    indices = indices[:w * h]
    # direct codec round-trip
    enc = _lzw_encode(indices, 2)
    assert _lzw_decode(enc, 2, len(indices)) == indices
    # and through the whole GIF container
    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]
    gif = _make_gif(w, h, palette, indices)
    f = gif_decode_features(gif)
    n = len(indices)
    exp = [sum(palette[i][c] for i in indices) / n / 255.0
           for c in range(3)]
    assert f[0] == 3.0 and f[1] == w / 1e4 and f[2] == h / 1e4
    for got, want in zip(f[3:], exp):
        assert abs(got - want) < 1e-9


def test_gif_lzw_cscsc_and_clear_reset():
    from tpg_weather_etl_spark.operators.multimodal import _lzw_decode

    # an all-same-pixel run forces the code == next_code branch on
    # the second code after CLEAR
    run = [1] * 100
    assert _lzw_decode(_lzw_encode(run, 2), 2, 100) == run
    # truncated stream raises (feeds the poison path)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        _lzw_decode(_lzw_encode(run, 2)[:2], 2, 100)


def test_gif_through_spark_seam(spark):
    """End-to-end through extract_features: valid GIFs, a truncated
    GIF (poison -> NULL), and a non-GIF, across multiple Arrow
    batches."""
    from tpg_weather_etl_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        gif_decode_features,
    )

    g1 = _make_gif(2, 2, [(255, 255, 255), (0, 0, 0)], [0, 1, 1, 0])
    g2 = _make_gif(3, 1, [(255, 0, 0), (0, 255, 0)], [0, 0, 1])
    rows = [
        (1, "image", g1, "image/gif", 2, 2, None),
        (2, "image", g2, "image/gif", 3, 1, None),
        (3, "image", g1[:20], "image/gif", 2, 2, None),   # truncated
        (4, "image", b"JFIF....", "image/jpeg", 8, 8, None),
        (5, "image", None, "image/gif", None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(3)
    out = {r.media_id: r for r in
           extract_features(media, decode_fn=gif_decode_features)
           .collect()}
    assert out[1].feature is not None and out[1].feature[0] == 3.0
    # g1 is half white half black -> channel means 0.5
    for v in out[1].feature[3:]:
        assert abs(v - 0.5) < 1e-6
    # g2: 2/3 red + 1/3 green
    assert abs(out[2].feature[3] - 2 / 3) < 1e-6
    assert abs(out[2].feature[4] - 1 / 3) < 1e-6
    assert out[3].feature is None and out[3].n_bytes == 20
    assert out[4].feature is None
    assert out[5].feature is None and out[5].n_bytes is None


def test_gif_malformed_raise_valueerror_contract():
    """ADVICE r9: a zero-area image descriptor and pixel indices
    beyond the color table must raise ValueError like every other
    malformed-payload path — direct callers of the decoder get one
    consistent exception type, not ZeroDivisionError/IndexError."""
    import struct

    import pytest

    from tpg_weather_etl_spark.operators.multimodal import (
        gif_decode_features,
    )

    # zero-area: descriptor says 0x0 but carries an LZW block
    g = _make_gif(1, 1, [(1, 2, 3), (4, 5, 6)], [0])
    zero = bytearray(g)
    # image descriptor starts after header(13) + GCT(2*3) + ext(8):
    # 0x2C, then <HHHH> left, top, width, height
    off = 13 + 6 + 8
    assert zero[off] == 0x2C
    zero[off + 5:off + 9] = struct.pack("<HH", 0, 0)
    with pytest.raises(ValueError):
        gif_decode_features(bytes(zero))

    # index beyond the declared color table: a 2-entry palette padded
    # to 2 slots, but the raster references index 2 via a forged
    # min_code_size of 3 (8-entry code space, 2-entry table)
    bad = _make_gif(2, 1, [(1, 2, 3), (4, 5, 6)], [2, 3],
                    min_code_size=3)
    with pytest.raises(ValueError):
        gif_decode_features(bad)
