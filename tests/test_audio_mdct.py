"""MDCT audio decoder (operators/audio_mdct.py): golden bytes, TDAC
round-trips against the independent test-side encoder, poison inputs,
and the Arrow-batched Spark seam."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tests.amdc_encoder_ref import encode_amdc, forward_mdct
from tpg_weather_etl_spark.operators.audio_mdct import (
    amdc_decode,
    amdc_decode_features,
    sine_window,
)


def test_princen_bradley_window_identity():
    for n in (16, 128, 512):
        w = sine_window(n)
        assert np.allclose(w[:n] ** 2 + w[n:] ** 2, 1.0, atol=1e-12)


def _golden_single_tone() -> bytes:
    """Hand-assembled AMDC payload produced by NEITHER the encoder nor
    the decoder: N=16, rate=8000, 2 frames; frame 0 carries one
    quantized coefficient (k=0, q=100, scale=0.5), frame 1 silence."""
    n = 16
    head = b"AMDC" + struct.pack("<IHH", 8000, n, 2)
    f0 = struct.pack("<f", 0.5) + bytes([100]) + bytes(n - 1)
    f1 = struct.pack("<f", 1.0) + bytes(n)
    return head + f0 + f1


def test_golden_hand_assembled_bytes():
    """Expected samples computed with a plain double loop over the
    published IMDCT formula — an independent third formulation next to
    the decoder's cached matrix and the encoder's einsum."""
    rate, samples = amdc_decode(_golden_single_tone())
    assert rate == 8000
    n = 16
    assert len(samples) == n  # (n_frames - 1) * N
    x0 = 100 * 0.5  # dequantized k=0 coefficient of frame 0
    expected = []
    for t in range(n, 2 * n):  # decoder drops the leading N padding
        y = (2.0 / n) * x0 * np.cos(
            np.pi / n * (t + 0.5 + n / 2.0) * 0.5)
        w = np.sin(np.pi / (2 * n) * (t + 0.5))
        expected.append(y * w)
    assert np.allclose(samples, expected, atol=1e-12)


def test_tdac_round_trip_against_independent_encoder():
    """Encode a sum of sines with the test-side encoder, decode with
    the package decoder: reconstruction error is bounded by int8
    quantization noise — the proof the two independent implementations
    agree on the lapped-transform algebra, frame state included."""
    n = 128
    rate = 16000
    t = np.arange(n * 20) / rate
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)
           + 0.3 * np.sin(2 * np.pi * 1270 * t + 0.7))
    rate_out, rec = amdc_decode(encode_amdc(sig, rate, n=n))
    assert rate_out == rate
    assert len(rec) == len(sig)
    err = np.sqrt(np.mean((rec - sig) ** 2))
    ref = np.sqrt(np.mean(sig ** 2))
    assert err / ref < 0.02, f"relative rms error {err / ref}"


def test_overlap_state_crosses_frames():
    """Corrupting ONE frame's coefficients must perturb samples in the
    NEIGHBOURING frame's output range — the overlap-add tail is real
    cross-frame state, unlike JPEG's independent blocks."""
    n = 64
    rng = np.random.default_rng(3)
    sig = rng.standard_normal(n * 8) * 0.3
    payload = bytearray(encode_amdc(sig, 8000, n=n))
    # zero every coefficient of frame 3 (frames start at byte 12)
    fb = 4 + n
    start = 12 + 3 * fb + 4
    payload[start:start + n] = bytes(n)
    _, dirty = amdc_decode(bytes(payload))
    _, clean = amdc_decode(encode_amdc(sig, 8000, n=n))
    # frame 3 covers padded [3n, 5n) = output [2n, 4n); its loss must
    # leak into both halves of that range (each output sample sums two
    # overlapped frames)
    assert not np.allclose(dirty[2 * n:3 * n], clean[2 * n:3 * n])
    assert not np.allclose(dirty[3 * n:4 * n], clean[3 * n:4 * n])
    # frames far away are untouched
    assert np.allclose(dirty[6 * n:], clean[6 * n:])


def test_forward_inverse_are_exact_without_quantization():
    """Pure TDAC identity at float64: window -> MDCT -> IMDCT ->
    window -> overlap-add reproduces the signal to machine precision
    (no quantizer in the loop)."""
    n = 32
    rng = np.random.default_rng(11)
    sig = rng.standard_normal(n * 6)
    win = sine_window(n)
    padded = np.concatenate([np.zeros(n), sig, np.zeros(n)])
    out = np.zeros(len(padded))
    from tpg_weather_etl_spark.operators.audio_mdct import _imdct_matrix
    for f in range(len(sig) // n + 1):
        coeffs = forward_mdct(padded[f * n:(f + 2) * n] * win)
        out[f * n:(f + 2) * n] += (_imdct_matrix(n) @ coeffs) * win
    assert np.allclose(out[n:-n], sig, atol=1e-10)


@pytest.mark.parametrize("payload", [
    b"",
    b"AMDX" + bytes(20),
    b"AMDC" + struct.pack("<IHH", 8000, 17, 2) + bytes(42),   # N not 2^k
    b"AMDC" + struct.pack("<IHH", 8000, 8, 2) + bytes(24),    # N too small
    b"AMDC" + struct.pack("<IHH", 8000, 16, 1) + bytes(20),   # 1 frame
    b"AMDC" + struct.pack("<IHH", 0, 16, 2) + bytes(40),      # zero rate
    _golden_single_tone()[:-3],                               # truncated
    _golden_single_tone() + b"x",                             # oversized
    (b"AMDC" + struct.pack("<IHH", 8000, 16, 2)
     + struct.pack("<f", float("nan")) + bytes(16)
     + struct.pack("<f", 1.0) + bytes(16)),                   # NaN scale
])
def test_poison_payloads_raise(payload):
    with pytest.raises(ValueError):
        amdc_decode_features(payload)


def test_features_shape_and_tag():
    feats = amdc_decode_features(_golden_single_tone())
    assert len(feats) == 6
    assert feats[0] == 5.0
    assert feats[1] == pytest.approx(0.08)       # 8000 / 1e5
    assert feats[2] == pytest.approx(16 / 8000)  # duration
    assert feats[3] > 0 and feats[4] >= feats[3]


def test_amdc_through_spark_seam(spark):
    """AMDC payloads ride the same Arrow-batched mapInPandas seam as
    every other decoder: real payloads decode (lead tag 5.0), poison
    payloads -> NULL feature, WAV/GIF neighbours still dispatch."""
    from tests.test_multimodal import _golden_wav
    from tpg_weather_etl_spark.operators.multimodal import (
        extract_features,
        real_decode_features,
    )

    n = 64
    t = np.arange(n * 4) / 8000
    good = encode_amdc(0.4 * np.sin(2 * np.pi * 500 * t), 8000, n=n)
    rows = [
        (1, "audio", good, "audio/amdc", None, None, 32),
        (2, "audio", good[:30], "audio/amdc", None, None, 32),  # poison
        (3, "audio", _golden_wav(), "audio/wav", None, None, 100),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, content binary, mime string,"
              " width int, height int, duration_ms long")
    out = {r.media_id: r for r in
           extract_features(media, real_decode_features).collect()}
    assert out[1].feature is not None and out[1].feature[0] == 5.0
    assert out[1].feature[2] == pytest.approx(len(t) / 8000)
    assert out[2].feature is None
    assert out[3].feature is not None and out[3].feature[0] == 1.0


def test_imdct_cache_bounded_above_max_n():
    # ADVICE r11: a single valid N=4096 payload must not pin a ~268 MB
    # basis matrix in every executor worker forever. Large hops are
    # computed per call; only N <= _IMDCT_CACHE_MAX_N is memoized.
    from tpg_weather_etl_spark.operators.audio_mdct import (
        _IMDCT_CACHE, _IMDCT_CACHE_MAX_N, _imdct_matrix)

    big = _IMDCT_CACHE_MAX_N * 2
    m1 = _imdct_matrix(big)
    assert big not in _IMDCT_CACHE
    m2 = _imdct_matrix(big)
    assert m1 is not m2 and np.array_equal(m1, m2)
    small = 32
    assert _imdct_matrix(small) is _imdct_matrix(small)
    assert small in _IMDCT_CACHE
