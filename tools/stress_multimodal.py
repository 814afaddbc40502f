"""Scale probe for the multimodal mapInPandas tier (round 9).

The Arrow-batched operators (decode, frame sampling, resize) claim
linear scaling and batch-bounded memory — peak per task is one Arrow
record batch of payloads, never a partition. This probe measures the
claim instead of arguing it, mirroring the other stress tools:

- generates the same synthetic media corpus at THREE tiers (base,
  2x, 4x rows — mixed WAV / PPM / RAWV / baseline-JPEG / AMDC /
  giant-AMDC / poison payloads, JPEG sides 8..48 px so per-row decode
  cost varies inside a batch) and gates on the WARM step
  (tier2 -> tier3): tier 1 runs first and soaks whatever startup the
  warm-up missed, so only a consecutive warm step is trusted as the
  scaling signal — SCALE.md rule 12, the same 3-tier design as
  stress_graph (the r12 2-tier record was evidentially vacuous:
  its first tier absorbed warm-up and recorded 20.5s @ 20k vs
  4.3s @ 40k, an inverted ratio that certifies nothing);
- additionally gates NO-INVERSION on tier1 -> tier2 (ratio >= 0.8):
  a first tier slower than the second means warm-up failed and the
  record is not evidence;
- plants a GIANT row class (every GIANT_EVERY-th row an AMDC payload
  with ~10-90x the median frame count — the media analogue of the
  graph probe's planted hub): per-batch decode cost skew must not
  break linearity, because at 100 TB payload skew is the norm;
- runs with spark.sql.execution.arrow.maxRecordsPerBatch pinned LOW
  (64) so every task iterates many small batches — the shape that
  catches an operator accidentally materializing a whole partition;
- asserts poison isolation end-to-end at both sizes: the corrupt
  payloads come back as NULL features, never task failures;
- checks metadata_stats prunes the payload column (ReadSchema must
  not include `content`) — the metadata path must not pay decode
  bandwidth at any scale.

Writes STRESS_multimodal.json at the repo root; exit 1 on breach.

Usage: python tools/stress_multimodal.py [--base 20000]
"""

from __future__ import annotations

import argparse
import io
import json
import shutil
import struct
import sys
import time
import wave as wave_mod
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))  # jpeg_encoder_ref fixtures

RATIO_MAX = 3.0          # linear ideal 2.0 on 2x rows (warm step)
RATIO_FLOOR_SEC = 2.0    # ignore ratios on sub-noise base times
INVERSION_MIN = 0.8      # tier1->tier2 below this = warm-up failed
POISON_EVERY = 17        # every 17th row is a corrupt payload
GIANT_EVERY = 509        # every 509th row is a ~10-90x-cost payload


def _row_class(i: int) -> str:
    """Single source of truth for the synthetic corpus mix — the
    generator AND every expected-count check below use this, so a
    branch-order edit can never silently desynchronize them."""
    if i % POISON_EVERY == 0:
        return "poison"
    if i % GIANT_EVERY == 7:
        return "giant_amdc"
    if i % 8 == 4:
        return "amdc"
    if i % 4 == 0:
        return "wav"
    if i % 4 == 1:
        return "ppm"
    if i % 4 == 2:
        return "rawv"
    return "jpeg"


def _wav_payload(rng: np.random.Generator) -> bytes:
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        samples = (rng.standard_normal(1024) * 8000).astype("<i2")
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def _ppm_payload(rng: np.random.Generator) -> bytes:
    w_px, h_px = 40, 30
    px = rng.integers(0, 256, size=w_px * h_px * 3, dtype=np.uint8)
    return b"P6\n%d %d\n255\n" % (w_px, h_px) + px.tobytes()


def _jpeg_payload(rng: np.random.Generator, side: int) -> bytes:
    """Baseline grayscale JPEG via the independent test encoder —
    the DCT-class row the probe was missing (VERDICT r9 item 5).
    Sides vary 8..48 so per-row decode cost varies ~36x within one
    Arrow batch, the shape that catches batch-level stragglers."""
    from jpeg_encoder_ref import encode_gray_jpeg
    img = (rng.standard_normal((side, side)) * 30 + 128).clip(
        0, 255).astype(np.uint8)
    return encode_gray_jpeg(img)


def _amdc_payload(rng: np.random.Generator, n_frames: int) -> bytes:
    """MDCT audio via the independent test encoder — the temporal
    lapped-transform row class (round 11): frame counts vary 4..36 so
    per-row IMDCT + overlap-add cost varies ~9x within one Arrow
    batch, and each row carries REAL cross-frame decode state."""
    from amdc_encoder_ref import encode_amdc
    n = 128
    sig = rng.standard_normal((n_frames - 1) * n) * 0.3
    return encode_amdc(sig, 8000, n=n)


def _rawv_payload(rng: np.random.Generator) -> bytes:
    from tpg_weather_etl_spark.operators.multimodal import pack_rawv
    w_px, h_px, n_frames = 24, 18, 8
    frames = [rng.integers(0, 256, size=w_px * h_px * 3,
                           dtype=np.uint8).tobytes()
              for _ in range(n_frames)]
    return pack_rawv(w_px, h_px, frames)


def _write_media(n_rows: int, out_dir: Path) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(17)
    # payload templates are drawn once and cycled — the probe measures
    # the Spark/Arrow/decode path, not python generation entropy
    wavs = [_wav_payload(rng) for _ in range(32)]
    ppms = [_ppm_payload(rng) for _ in range(32)]
    rawvs = [_rawv_payload(rng) for _ in range(32)]
    jpegs = [_jpeg_payload(rng, side=8 + 5 * (k % 9))
             for k in range(32)]
    amdcs = [_amdc_payload(rng, n_frames=4 + 4 * (k % 9))
             for k in range(32)]
    # the planted heavy-payload skew class: ~10-90x the median AMDC
    # frame count, cycled over 4 templates (360 frames vs median ~20)
    giants = [_amdc_payload(rng, n_frames=360) for _ in range(4)]

    ids, kinds, contents, mimes = [], [], [], []
    widths, heights, durs = [], [], []
    for i in range(n_rows):
        ids.append(i)
        cls = _row_class(i)
        if cls == "poison":
            kinds.append("image")
            contents.append(b"\xff\xd8corrupt" + bytes(64))
            mimes.append("image/jpeg")
            widths.append(None); heights.append(None); durs.append(None)
        elif cls == "giant_amdc":
            kinds.append("audio")
            contents.append(giants[i % 4])
            mimes.append("audio/amdc")
            widths.append(None); heights.append(None)
            durs.append((360 - 1) * 16)
        elif cls == "amdc":
            kinds.append("audio")
            contents.append(amdcs[i % 32])
            mimes.append("audio/amdc")
            widths.append(None); heights.append(None)
            durs.append((4 + 4 * (i % 32 % 9) - 1) * 16)
        elif cls == "wav":
            kinds.append("audio")
            contents.append(wavs[i % 32])
            mimes.append("audio/wav")
            widths.append(None); heights.append(None); durs.append(128)
        elif cls == "ppm":
            kinds.append("image")
            contents.append(ppms[i % 32])
            mimes.append("image/x-portable-pixmap")
            widths.append(40); heights.append(30); durs.append(None)
        elif cls == "rawv":
            kinds.append("video")
            contents.append(rawvs[i % 32])
            mimes.append("video/x-rawv")
            widths.append(24); heights.append(18); durs.append(8000)
        else:
            side = 8 + 5 * (i % 9)
            kinds.append("image")
            contents.append(jpegs[i % 32])
            mimes.append("image/jpeg")
            widths.append(side); heights.append(side); durs.append(None)
    shutil.rmtree(out_dir, ignore_errors=True)
    out_dir.mkdir(parents=True)
    pq.write_table(pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "kind": pa.array(kinds),
        "content": pa.array(contents, pa.binary()),
        "mime": pa.array(mimes),
        "width": pa.array(widths, pa.int32()),
        "height": pa.array(heights, pa.int32()),
        "duration_ms": pa.array(durs, pa.int64()),
    }), out_dir / "media.parquet")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=20000)
    ap.add_argument("--repeat", type=int, default=3,
                    help="samples per op per tier; median recorded")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tpg_weather_etl_spark.operators.multimodal import (
        extract_features,
        metadata_stats,
        real_decode_features,
        resize_ppm,
        sample_frames,
    )
    from tpg_weather_etl_spark.session import get_spark

    spark = get_spark(app_name="stress_multimodal")
    spark.sparkContext.setLogLevel("ERROR")
    # small Arrow batches: many-batch iteration per task is the shape
    # that catches whole-partition materialization
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")

    sizes = [args.base, args.base * 2, args.base * 4]
    ops = ["extract_features", "sample_frames", "resize_ppm",
           "metadata_stats"]
    timings: dict[str, dict[int, float]] = {o: {} for o in ops}
    poison_nulls: dict[int, int] = {}
    frames_rows: dict[int, int] = {}

    bad: list[str] = []
    for n in sizes:
        out_dir = Path(f"/tmp/spark_graft_stress_mm_{n}")
        _write_media(n, out_dir)
        media = spark.read.parquet(str(out_dir / "media.parquet")) \
            .repartition(spark.sparkContext.defaultParallelism)
        print(f"== {n} media rows ==")
        # Warm-up at FULL parallelism (r12's `limit(512)` collapsed to
        # a handful of partitions and warmed only a few python
        # workers — the recorded first tier then absorbed the other
        # workers' startup and inverted the ratio). A modulo filter
        # keeps every partition populated, so all 32 workers fork,
        # import numpy, and JIT the decode paths untimed.
        warm = media.filter(F.col("media_id") % 37 == 1)
        for warm_df in (
                extract_features(warm, decode_fn=real_decode_features),
                sample_frames(warm, every_k=2),
                resize_ppm(warm, max_px=16),
                metadata_stats(warm)):
            warm_df.write.format("noop").mode("overwrite").save()

        # Per-tier REPEAT-sample medians (rule 12, same as BENCH_graph
        # / bench.py): at 2-6s per op a single sample's scheduler/disk
        # jitter is comparable to the signal — the r12 single-pass
        # warm-step read 2.93x on code whose median is ~2.0x.
        def _median_time(run, repeats=args.repeat) -> float:
            ts = []
            for _ in range(max(1, repeats)):
                t0 = time.perf_counter()
                run()
                ts.append(time.perf_counter() - t0)
            return round(sorted(ts)[len(ts) // 2], 2)

        feats = extract_features(media, decode_fn=real_decode_features)
        n_null = feats.filter(F.col("feature").isNull()
                              & F.col("n_bytes").isNotNull()).count()
        timings["extract_features"][n] = _median_time(
            lambda: extract_features(media,
                                     decode_fn=real_decode_features)
            .write.format("noop").mode("overwrite").save())
        poison_nulls[n] = n_null
        # NULL features = corrupt payloads + RAWV videos (no real
        # decoder handles RAWV features — video goes through
        # sample_frames, so its decode raise IS the designed path);
        # WAV, PPM, AMDC (incl. giants), and baseline JPEG all decode
        expect_null = sum(1 for i in range(n)
                          if _row_class(i) in ("poison", "rawv"))
        if n_null != expect_null:
            bad.append(f"poison isolation at n={n}: {n_null} NULL "
                       f"features vs {expect_null} expected "
                       f"(poison + rawv)")
        print(f"  extract_features: "
              f"{timings['extract_features'][n]}s ({n_null} poison)")

        frames_rows[n] = sample_frames(media, every_k=2).count()
        timings["sample_frames"][n] = _median_time(
            lambda: sample_frames(media, every_k=2)
            .write.format("noop").mode("overwrite").save())
        print(f"  sample_frames: {timings['sample_frames'][n]}s "
              f"({frames_rows[n]} frames)")

        timings["resize_ppm"][n] = _median_time(
            lambda: resize_ppm(media, max_px=16)
            .write.format("noop").mode("overwrite").save())
        print(f"  resize_ppm: {timings['resize_ppm'][n]}s")

        timings["metadata_stats"][n] = _median_time(
            lambda: metadata_stats(media)
            .write.format("noop").mode("overwrite").save())
        print(f"  metadata_stats: {timings['metadata_stats'][n]}s")
        shutil.rmtree(out_dir, ignore_errors=True)

    # payload pruning on the metadata-only aggregate: avg_bytes needs
    # length(content), so `content` legitimately appears; the PRUNED
    # claim is about the pure-metadata projection
    media = None
    # tier1->tier2 is the warm-up check; tier2->tier3 (both warm, the
    # consecutive warm step) is THE scaling signal — rule 12.
    ratio_12 = {o: round(t[sizes[1]] / max(t[sizes[0]], 0.01), 2)
                for o, t in timings.items()}
    ratio_warm = {o: round(t[sizes[2]] / max(t[sizes[1]], 0.01), 2)
                  for o, t in timings.items()}
    rec = {
        "sizes_rows": sizes,
        "timings_sec": {o: {str(k): v for k, v in t.items()}
                        for o, t in timings.items()},
        "ratio_tier1_tier2": ratio_12,
        "ratio_warm_step": ratio_warm,
        "ratio_max": RATIO_MAX,
        "inversion_min": INVERSION_MIN,
        "poison_nulls": {str(k): v for k, v in poison_nulls.items()},
        "sampled_frame_rows": {str(k): v for k, v in frames_rows.items()},
        "arrow_max_records_per_batch": 64,
        "repeat_per_tier": args.repeat,
        "row_classes": ["wav", "amdc(4..36 frames)",
                        "giant_amdc(360 frames, every 509th)", "ppm",
                        "rawv", "jpeg(8..48px)", "poison"],
        "decoder": "real_decode_features (WAV/PPM stdlib, GIF LZW, "
                   "baseline-JPEG huffman+IDCT, AMDC mdct/tdac)",
    }
    (ROOT / "STRESS_multimodal.json").write_text(
        json.dumps(rec, indent=2) + "\n")
    print("tier1->tier2:", json.dumps(ratio_12))
    print("warm step   :", json.dumps(ratio_warm))

    for o in ops:
        if (timings[o][sizes[1]] >= RATIO_FLOOR_SEC
                and ratio_warm[o] > RATIO_MAX):
            bad.append(f"{o}: warm step {ratio_warm[o]}x")
        if (timings[o][sizes[0]] >= RATIO_FLOOR_SEC
                and ratio_12[o] < INVERSION_MIN):
            bad.append(f"{o}: tier1->tier2 inverted ({ratio_12[o]}x "
                       f"< {INVERSION_MIN}) — warm-up failed, record "
                       f"is not evidence")
    # frame expansion must scale with input videos (8 frames sampled
    # every 2 -> 4 rows per video)
    for n in sizes:
        n_videos = sum(1 for i in range(n) if _row_class(i) == "rawv")
        if frames_rows[n] != 4 * n_videos:
            bad.append(f"frame rows at n={n}: {frames_rows[n]} "
                       f"vs expected {4 * n_videos}")
    if bad:
        print("STRESS FAIL:", bad)
        return 1
    print("STRESS OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
