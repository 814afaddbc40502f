"""Test-side baseline grayscale JPEG ENCODER (ITU-T T.81 Annex K
tables) used to produce fixtures for the package decoder.

Kept deliberately independent of the decoder's internals: the only
shared artifact is the public spec (zigzag order, canonical Huffman,
marker layout), so an encoder/decoder pair agreeing on round-trips is
evidence about spec conformance, not self-consistency of one buggy
module. The golden-byte test in test_jpeg.py additionally pins
hand-assembled bytes produced by neither side.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# T.81 Annex K.1 luminance quantization table (zigzag order when
# written to DQT; stored here in natural row-major order)
QTABLE_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)

# Annex K.3.1: luminance DC — counts per code length 1..16, symbols
DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_SYMBOLS = list(range(12))

# Annex K.3.2: luminance AC
AC_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_SYMBOLS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

_B = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _B[_k, _n] = np.cos(np.pi * _k * (2 * _n + 1) / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5)


def _codes(counts, symbols):
    """Canonical Huffman: symbol -> (code, length)."""
    out = {}
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            out[symbols[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def pad(self) -> None:
        """Pad to byte boundary with 1-bits (T.81 F.1.2.3)."""
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def encode_gray_jpeg(px: np.ndarray, quality_scale: float = 1.0,
                     restart_interval: int = 0) -> bytes:
    """Encode a (h, w) uint8 array as baseline grayscale JFIF.

    quality_scale multiplies the Annex K table (>=1 is coarser);
    restart_interval inserts DRI + RSTn markers every N MCUs.
    """
    h, w = px.shape
    q = np.maximum(1, np.round(QTABLE_LUMA * quality_scale)).reshape(8, 8)
    dc = _codes(DC_COUNTS, DC_SYMBOLS)
    ac = _codes(AC_COUNTS, AC_SYMBOLS)

    out = bytearray(b"\xff\xd8")                       # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + b"\x01\x01\x00\x00\x01\x00\x01\x00\x00"      # APP0
    zz = bytes(int(q.flat[ZIGZAG[i]]) for i in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz  # DQT
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) \
        + b"\x01\x11\x00"                              # SOF0, 1 comp
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(DC_SYMBOLS)) \
        + b"\x00" + bytes(DC_COUNTS) + bytes(DC_SYMBOLS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(AC_SYMBOLS)) \
        + b"\x10" + bytes(AC_COUNTS) + bytes(AC_SYMBOLS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00" \
        + b"\x00\x3f\x00"                              # SOS

    bw_, bh_ = (w + 7) // 8, (h + 7) // 8
    padded = np.zeros((bh_ * 8, bw_ * 8), dtype=np.float64)
    padded[:h, :w] = px.astype(np.float64)
    # replicate edges into the pad area (keeps high-freq energy low)
    if h < bh_ * 8:
        padded[h:, :w] = padded[h - 1, :w]
    if w < bw_ * 8:
        padded[:, w:] = padded[:, w - 1:w]

    wr = _BitWriter()
    pred = 0
    rst = 0
    for bi in range(bw_ * bh_):
        if restart_interval and bi and bi % restart_interval == 0:
            wr.pad()
            wr.buf += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            pred = 0
        y, x = divmod(bi, bw_)
        blk = padded[y * 8:(y + 1) * 8, x * 8:(x + 1) * 8] - 128.0
        coeff = _B @ blk @ _B.T
        qc = np.round(coeff / q).astype(int)
        zzc = [int(qc.flat[ZIGZAG[i]]) for i in range(64)]
        diff = zzc[0] - pred
        pred = zzc[0]
        t = _category(diff)
        code, ln = dc[t]
        wr.put(code, ln)
        if t:
            wr.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0
        last_nz = max((i for i in range(1, 64) if zzc[i]), default=0)
        for i in range(1, 64):
            v = zzc[i]
            if i > last_nz:
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                zcode, zln = ac[0xF0]          # ZRL
                wr.put(zcode, zln)
                run -= 16
            s = _category(v)
            code, ln = ac[(run << 4) | s]
            wr.put(code, ln)
            wr.put(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            code, ln = ac[0x00]                # EOB
            wr.put(code, ln)
    wr.pad()
    out += wr.buf
    out += b"\xff\xd9"                         # EOI
    return bytes(out)
