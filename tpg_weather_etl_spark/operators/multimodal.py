"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched
``mapInPandas`` pipelines.

The Spark-side machinery — schemas, batch iteration, partition sizing,
UDF signatures — is real and tested. Decoding comes in two flavors
behind the same ``decode_fn`` seam: ``stdlib_decode_features`` REALLY
decodes WAV (RIFF/PCM via ``wave``) and PPM (P6) payloads with the
Python stdlib — golden-bytes tested — while ``fake_decode_features``
remains the deterministic stand-in for codec-backed formats
(JPEG/MP3/H.264) this container cannot parse; plug PIL/torchaudio/
ffmpeg into the seam in production, no Spark code changes.

Scale notes: mapInPandas streams Arrow record batches — peak memory is
one batch (spark.sql.execution.arrow.maxRecordsPerBatch), not one
partition, which is what lets 100 MB videos flow through 4 GB
executors. Metadata-only transforms stay in pure Catalyst expressions
and never deserialize the payload.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("content", T.BinaryType(), True),      # opaque payload
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),       # images/video
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),    # audio/video
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def fake_decode_features(content: bytes | None, dim: int = 8) -> list[float]:
    """STUB decoder: deterministic pseudo-features from raw bytes.

    Replace with a real decode+embed (PIL → CNN, torchaudio → wav2vec,
    ffmpeg frame-sample → CLIP) in production. Raises on None so the
    pipeline's null-handling is exercised like a real decoder's would
    be.
    """
    if content is None:
        raise ValueError("no content")
    acc = [0] * dim
    for i, b in enumerate(content):
        acc[i % dim] = (acc[i % dim] * 31 + b) % 997
    return [float(x) / 997.0 for x in acc]


def stdlib_decode_features(content: bytes | None) -> list[float]:
    """REAL decoder for the two container-free media formats the
    Python stdlib can parse — proof the ``decode_fn`` seam carries an
    actual decoder, not only the deterministic stub:

    - WAV (RIFF) via the ``wave`` module → [1.0, channels, rate/1e5,
      duration_s, rms, peak] over the PCM samples
    - PPM (P6) parsed directly → [2.0, w/1e4, h/1e4, mean_r, mean_g,
      mean_b] over the raw pixel bytes

    Anything else raises, exercising the poison-payload → NULL path.
    Codec-backed formats (JPEG/MP3/H.264) still need PIL/ffmpeg
    plugged into the same seam.
    """
    if content is None:
        raise ValueError("no content")
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        import io
        import struct
        import wave

        with wave.open(io.BytesIO(content)) as w:
            nch, width, rate = w.getnchannels(), w.getsampwidth(), \
                w.getframerate()
            n = w.getnframes()
            raw = w.readframes(n)
        fmt = {1: "b", 2: "h", 4: "i"}[width]
        samples = struct.unpack(f"<{len(raw) // width}{fmt}", raw)
        scale = float(2 ** (8 * width - 1))
        rms = ((sum(s * s for s in samples) / len(samples)) ** 0.5 / scale
               if samples else 0.0)
        peak = max((abs(s) for s in samples), default=0) / scale
        return [1.0, float(nch), rate / 1e5, n / rate, rms, peak]
    if content[:2] == b"P6":
        header, rest = content.split(b"\n", 1)
        fields: list[int] = []
        while len(fields) < 3:
            line, rest = rest.split(b"\n", 1)
            if not line.startswith(b"#"):
                fields.extend(int(x) for x in line.split())
        w_px, h_px, maxval = fields[:3]
        px = rest[: w_px * h_px * 3]
        chans = [px[c::3] for c in range(3)]
        means = [sum(c) / len(c) / maxval if c else 0.0 for c in chans]
        return [2.0, w_px / 1e4, h_px / 1e4, *means]
    raise ValueError("undecodable format")


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes | None], list[float]] = fake_decode_features,
) -> DataFrame:
    """Arrow-batched feature extraction over the binary payloads.

    mapInPandas signature: Iterator[pd.DataFrame] → Iterator[pd.DataFrame]
    so one task never holds more than a record batch of payloads.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes = [], []
            for content in pdf["content"]:
                if content is None:
                    feats.append(None)
                    nbytes.append(None)
                    continue
                try:
                    feats.append(decode_fn(bytes(content)))
                    nbytes.append(len(content))
                except Exception:
                    feats.append(None)  # poison payloads → NULL, not task death
                    nbytes.append(len(content))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pd.array(nbytes, dtype="Int64"),
                "feature": feats,
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only profile — pure Catalyst, payload column pruned at
    the scan (verify with plans.pushed_filters/ReadSchema)."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.length(F.col("content")).cast("double")).alias("avg_bytes"),
        F.avg("width").alias("avg_width"),
        F.avg("duration_ms").alias("avg_duration_ms"),
    )


def resize_stub(media: DataFrame, max_px: int = 256) -> DataFrame:
    """STUB resize: real impl decodes+resizes in mapInPandas; the stub
    marks payloads larger than a byte budget for the resize path, so
    the partition/selection plumbing is testable without codecs."""
    return media.withColumn(
        "needs_resize",
        (F.col("kind") == "image")
        & (F.greatest(F.col("width"), F.col("height")) > max_px),
    )


# ---------------------------------------------------------------------------
# Video frame sampling — REAL parser for the deterministic RAWV
# container (no codecs in this environment, so the container is a
# trivial uncompressed format, but the sampling operator itself is the
# production shape: row expansion inside Arrow batches, bounded
# memory, stride selection before any pixel copy).
#
# RAWV layout: b"RAWV" | u16 width | u16 height | u16 n_frames |
#              n_frames × (width*height*3) RGB24 bytes.
# ---------------------------------------------------------------------------

FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("n_frames", T.IntegerType(), False),
    T.StructField("mean_intensity", T.DoubleType(), True),
    T.StructField("frame", T.BinaryType(), True),
])


def pack_rawv(width: int, height: int, frames: list[bytes]) -> bytes:
    """Build a RAWV payload (test fixtures + any synthetic source)."""
    import struct
    head = b"RAWV" + struct.pack("<HHH", width, height, len(frames))
    return head + b"".join(frames)


def sample_frames(media: DataFrame, every_k: int = 2,
                  id_col: str = "media_id",
                  content_col: str = "content") -> DataFrame:
    """Expand each RAWV video row into one row per sampled frame
    (every ``every_k``-th), with the frame bytes and mean intensity.

    mapInPandas so one input row may emit many output rows while Arrow
    bounds the batch size; the stride seek touches ONLY the sampled
    frames' byte ranges (no full-payload copy per frame) — the same
    access pattern a real ffmpeg-backed sampler needs for 100 MB
    videos on 4 GB executors. Non-RAWV / malformed payloads are
    skipped, not fatal (poison-input tolerance like the decoders
    above).
    """
    import struct

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "frame_idx", "n_frames",
                    "mean_intensity", "frame")}
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                if content is None or len(content) < 10 \
                        or bytes(content[:4]) != b"RAWV":
                    continue
                w, h, n = struct.unpack("<HHH", bytes(content[4:10]))
                fsize = w * h * 3
                if len(content) < 10 + n * fsize:
                    continue  # truncated payload
                for i in range(0, n, every_k):
                    off = 10 + i * fsize
                    frame = bytes(content[off:off + fsize])
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(i)
                    out["n_frames"].append(n)
                    out["mean_intensity"].append(
                        float(sum(frame)) / len(frame) if frame else None)
                    out["frame"].append(frame)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("content", T.BinaryType(), True),
    T.StructField("resized", T.BooleanType(), False),
])


def resize_ppm(media: DataFrame, max_px: int = 256,
               id_col: str = "media_id",
               content_col: str = "content") -> DataFrame:
    """REAL image resize for PPM (P6) payloads: nearest-neighbor
    downsample with numpy until max(width, height) ≤ ``max_px``;
    non-PPM or already-small payloads pass through unchanged with
    ``resized=false``.

    The production shape for corpus-wide image normalization: resize
    happens inside mapInPandas per Arrow batch (decoded pixels never
    leave the executor), output carries the rewritten payload so the
    downstream pipeline is format-unchanged. Swap the P6 codec for
    PIL/turbojpeg in an environment that ships them — the operator
    contract stays identical.
    """
    import numpy as np

    import re as _re
    # header = "P6" ws <w> ws <h> ws <maxval> + ONE ws byte, then raw
    # pixels start immediately — splitting the whole buffer on
    # whitespace would eat pixel bytes that happen to be 0x09/0x20
    _hdr = _re.compile(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s")

    def parse_p6(b: bytes):
        m = _hdr.match(b)
        if not m:
            return None
        w, h, maxval = (int(m.group(1)), int(m.group(2)),
                        int(m.group(3)))
        raw = b[m.end():]
        if maxval != 255 or len(raw) < w * h * 3:
            return None
        return w, h, np.frombuffer(raw[: w * h * 3],
                                   dtype=np.uint8).reshape(h, w, 3)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "width", "height", "content", "resized")}
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                b = bytes(content) if content is not None else None
                parsed = parse_p6(b) if b else None
                if parsed is None or max(parsed[0], parsed[1]) <= max_px:
                    w, h = (parsed[0], parsed[1]) if parsed else (None, None)
                    out["media_id"].append(int(mid))
                    out["width"].append(w)
                    out["height"].append(h)
                    out["content"].append(b)
                    out["resized"].append(False)
                    continue
                w, h, px = parsed
                scale = max_px / max(w, h)
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                yi = (np.arange(nh) * (h / nh)).astype(int)
                xi = (np.arange(nw) * (w / nw)).astype(int)
                small = px[yi][:, xi]
                payload = (b"P6\n%d %d\n255\n" % (nw, nh)
                           + small.tobytes())
                out["media_id"].append(int(mid))
                out["width"].append(nw)
                out["height"].append(nh)
                out["content"].append(payload)
                out["resized"].append(True)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)
