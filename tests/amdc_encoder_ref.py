"""Test-side AMDC ENCODER used to produce fixtures for the package's
MDCT decoder (operators/audio_mdct.py).

Kept deliberately independent of the decoder's internals — the only
shared artifacts are the published formulas (forward MDCT definition,
sine window, the AMDC byte layout documented in the decoder's
docstring) — so an encoder/decoder pair agreeing on round-trips is
evidence about TDAC conformance, not self-consistency of one buggy
module. The forward transform here is a direct einsum over the
textbook definition, not the decoder's cached synthesis matrix; the
golden-byte test in test_audio_mdct.py additionally pins
hand-assembled bytes produced by neither side.
"""

from __future__ import annotations

import struct

import numpy as np


def forward_mdct(frame: np.ndarray) -> np.ndarray:
    """Textbook MDCT: X[k] = sum_t x[t] cos(pi/N (t + 0.5 + N/2)
    (k + 0.5)), t in [0, 2N), k in [0, N)."""
    n2 = len(frame)
    n = n2 // 2
    t = np.arange(n2)[:, None] + 0.5 + n / 2.0
    k = np.arange(n)[None, :] + 0.5
    return np.einsum("t,tk->k", frame,
                     np.cos(np.pi / n * t * k))


def encode_amdc(samples: np.ndarray, rate: int, n: int = 128) -> bytes:
    """Encode float samples (|x| <= ~1) to an AMDC payload: pad N
    zeros both ends, sine-window each 50%-overlapped 2N frame, forward
    MDCT, quantize to int8 with a per-frame f32 scalefactor."""
    if len(samples) % n != 0:
        raise ValueError("sample count must be a multiple of N")
    win = np.sin(np.pi / (2 * n) * (np.arange(2 * n) + 0.5))
    padded = np.concatenate([np.zeros(n), samples, np.zeros(n)])
    n_frames = len(samples) // n + 1
    out = bytearray(b"AMDC" + struct.pack("<IHH", rate, n, n_frames))
    for f in range(n_frames):
        coeffs = forward_mdct(padded[f * n:(f + 2) * n] * win)
        peak = float(np.max(np.abs(coeffs)))
        scale = np.float32(peak / 127.0) if peak > 0 else np.float32(1.0)
        q = np.clip(np.round(coeffs / float(scale)), -127, 127
                    ).astype(np.int8)
        out += struct.pack("<f", float(scale)) + q.tobytes()
    return bytes(out)
