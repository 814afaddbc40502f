"""Scale probe for the streaming incremental-dedup path (round 14).

The batch-side operators all have stress records (STRESS_curation,
STRESS_graph, STRESS_similarity*, STRESS_multimodal); the STREAMING
incremental exact-dedup path (streaming/corpus_dedup.py) has only
correctness pins. Its 100 TB claim is specific and measurable: with
the fingerprint store kept as a table hash-bucketed on ``fp``, the
per-micro-batch cost is "shuffle the (small) batch + scan the store's
fp column" — so batch latency must grow (sub-)linearly in STORE SIZE
with the batch held fixed, and the slope must be the column scan, not
a re-shuffle of the store. A quadratic total (rewrite-the-store-per-
batch, the naive design) or a store-side Exchange would both show up
here long before they kill a production backfill.

Method (the 3-tier/warm-step discipline of SCALE.md rule 12):

- tiers of PRELOADED store size (default 250k / 500k / 1M unique
  fingerprints), written with the same write_bucketed layout the
  stream itself appends with;
- per tier, stream a FIXED batch (default 50k docs: half exact dupes
  of preloaded content, half new) through the real
  ``write_stream_dedup`` sink (availableNow trigger, fresh inbox +
  checkpoint per sample) and record wall-clock; SAMPLES samples, the
  first discarded as warm-up, median of the rest recorded;
- correctness gate per tier: the store grows by exactly the new half
  of every sample — dupes suppressed, no double-admission;
- scale gate: median latency ratio between consecutive tiers (store
  doubles) <= LATENCY_GROWTH_MAX. The batch is fixed, so the only
  tier-dependent term is the store-side fp scan; 2x store -> the
  gate allows up to 1.6x wall before calling it superlinear-in-state
  (a store-rewrite design would show ~2x and compounding; constant
  stream overhead pushes the expected ratio well BELOW the scan
  ratio);
- comparison row: the PLAIN parquet-path store (no bucketing) at the
  mid tier — the layout a naive user would pick — to record what the
  bucketed layout buys at the same state size.

Writes STRESS_streaming.json at the repo root; exit 1 on breach.

Usage: python tools/stress_streaming.py [--stores 250000,500000,1000000]
                                        [--batch 50000] [--samples 4]

Run with EXCLUSIVE CPU (no concurrent Spark) — same rule as every
other probe; contaminated samples read as latency growth.
"""

from __future__ import annotations

import argparse
import json
import math
import shutil
import statistics
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

# Per store-DOUBLING latency gate: the only state-dependent term in
# the batch is the store fp-column scan (+ sorted-bucket merge of the
# append), so 2x state must cost well under 2x wall on a fixed batch.
LATENCY_GROWTH_MAX = 1.6
OUT = ROOT / "STRESS_streaming.json"


def _preload_store(spark, table: str, n: int, num_buckets: int) -> None:
    """Write n unique-content documents into the bucketed store with
    the exact layout write_stream_dedup appends with (same columns,
    same bucket spec) — a store mid-life, not a toy."""
    from pyspark.sql import functions as F

    from tpg_weather_etl_spark.functions.text import doc_fingerprint
    from tpg_weather_etl_spark.sources.writers import write_bucketed

    docs = (
        spark.range(0, n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("preloaded document body "),
                     F.col("id").cast("string")).alias("text"),
            F.lit("en").alias("lang"),
            F.lit("preload").alias("source"),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
        .withColumn("fp", doc_fingerprint(F.col("text")))
    )
    write_bucketed(docs, table, ["fp"], num_buckets=num_buckets,
                   sort_cols=["fp"], mode="overwrite")


def _preload_plain(spark, out_dir: Path, n: int) -> None:
    from pyspark.sql import functions as F

    from tpg_weather_etl_spark.functions.text import doc_fingerprint

    docs = (
        spark.range(0, n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("preloaded document body "),
                     F.col("id").cast("string")).alias("text"),
            F.lit("en").alias("lang"),
            F.lit("preload").alias("source"),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
        .withColumn("fp", doc_fingerprint(F.col("text")))
    )
    docs.write.mode("overwrite").parquet(str(out_dir))


def _write_batch_files(inbox: Path, store_n: int, batch: int,
                       sample_tag: str) -> int:
    """jsonl drop files: half the batch duplicates preloaded content
    (must be suppressed by the cross-batch anti-join), half is new
    (unique per sample so successive samples do comparable work).
    Returns the number of NEW docs."""
    inbox.mkdir(parents=True, exist_ok=True)
    half = batch // 2
    lines = []
    for i in range(half):  # dupes of preload rows 0..half-1
        lines.append(json.dumps({
            "doc_id": 10_000_000_000 + i,
            "text": f"preloaded document body {i % store_n}",
            "lang": "en", "source": "recrawl", "n_chars": 32}))
    new = batch - half
    for i in range(new):
        lines.append(json.dumps({
            "doc_id": 20_000_000_000 + i,
            "text": f"new content {sample_tag} item {i}",
            "lang": "en", "source": "crawl", "n_chars": 32}))
    # several files, one availableNow micro-batch (maxFilesPerTrigger
    # is sized above the file count)
    per_file = max(1, len(lines) // 4)
    for fi in range(0, len(lines), per_file):
        (inbox / f"drop_{fi:08d}.jsonl").write_text(
            "\n".join(lines[fi:fi + per_file]))
    return new


def _run_sample(spark, inbox: Path, ckpt: Path, out_dir: Path,
                store_table: str | None, num_buckets: int) -> float:
    from tpg_weather_etl_spark.streaming.corpus_dedup import (
        stream_documents, write_stream_dedup)

    t0 = time.monotonic()
    q = write_stream_dedup(
        stream_documents(spark, str(inbox), max_files_per_trigger=64),
        str(out_dir), str(ckpt), store_table=store_table,
        num_buckets=num_buckets).start()
    q.awaitTermination(1200)
    if q.isActive:
        q.stop()
        raise SystemExit("sample stream did not terminate in 1200s")
    if q.exception() is not None:
        raise SystemExit(f"sample stream failed: {q.exception()}")
    return time.monotonic() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stores", default="250000,500000,1000000")
    ap.add_argument("--batch", type=int, default=50000)
    ap.add_argument("--samples", type=int, default=4,
                    help="per tier; the first is warm-up, median of "
                         "the rest is recorded")
    ap.add_argument("--buckets", type=int, default=32)
    args = ap.parse_args()
    tiers = [int(s) for s in args.stores.split(",") if s]

    from tpg_weather_etl_spark.session import get_spark
    from tpg_weather_etl_spark.sources.writers import (
        managed_table_location)

    spark = get_spark(app_name="stress_streaming")
    spark.sparkContext.setLogLevel("ERROR")

    work = ROOT / "stress_streaming_work"
    shutil.rmtree(work, ignore_errors=True)
    work.mkdir()

    record: dict = {"tiers": tiers, "batch": args.batch,
                    "samples_per_tier": args.samples,
                    "num_buckets": args.buckets,
                    "gate_latency_growth_max": LATENCY_GROWTH_MAX}
    failures: list[str] = []
    medians: dict[int, float] = {}

    try:
        for n in tiers:
            table = f"stress_stream_store_{n}_t"
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            loc = Path(managed_table_location(spark, table).removeprefix(
                "file:"))
            shutil.rmtree(loc, ignore_errors=True)
            t_pre = time.monotonic()
            _preload_store(spark, table, n, args.buckets)
            pre_s = time.monotonic() - t_pre
            samples: list[float] = []
            expected = n
            try:
                for s in range(args.samples):
                    tag = f"t{n}_s{s}"
                    inbox = work / f"inbox_{tag}"
                    ckpt = work / f"ckpt_{tag}"
                    new = _write_batch_files(inbox, n, args.batch, tag)
                    samples.append(round(_run_sample(
                        spark, inbox, ckpt, work / "unused_out",
                        table, args.buckets), 3))
                    expected += new
                spark.catalog.refreshTable(table)
                got = spark.table(table).count()
                if got != expected:
                    failures.append(
                        f"tier {n}: store holds {got} rows, expected "
                        f"{expected} (dupes not suppressed exactly)")
            finally:
                spark.sql(f"DROP TABLE IF EXISTS {table}")
                shutil.rmtree(loc, ignore_errors=True)
            med = round(statistics.median(samples[1:] or samples), 3)
            medians[n] = med
            record[f"tier_{n}"] = {
                "preload_sec": round(pre_s, 3),
                "batch_sec_samples": samples,
                "batch_sec_median": med,
                "store_rows_final": expected,
            }
            print(f"tier {n}: preload {pre_s:.1f}s, batch samples "
                  f"{samples} -> median {med}s")

        ratios = {}
        for a, b in zip(tiers, tiers[1:]):
            r = round(medians[b] / medians[a], 3) if medians[a] else 0.0
            ratios[f"{a}->{b}"] = r
            state_x = b / a
            # the gate is "per store DOUBLING"; compound it for
            # non-2x tier steps (4x state -> 1.6^2, not 1.6*2)
            gate = LATENCY_GROWTH_MAX ** math.log2(max(2.0, state_x))
            if r > gate:
                failures.append(
                    f"batch latency grew {r}x on {state_x}x store "
                    f"({a}->{b}): > {gate:.2f}x gate "
                    f"({LATENCY_GROWTH_MAX}x per doubling) — "
                    f"per-batch work is growing with state")
        record["latency_ratios"] = ratios

        # comparison row: plain (unbucketed path) store at the mid tier
        mid = tiers[len(tiers) // 2]
        plain_store = work / "plain_store"
        _preload_plain(spark, plain_store, mid)
        plain_samples = []
        for s in range(max(2, args.samples - 1)):
            tag = f"plain_s{s}"
            inbox = work / f"inbox_{tag}"
            ckpt = work / f"ckpt_{tag}"
            _write_batch_files(inbox, mid, args.batch, tag)
            plain_samples.append(round(_run_sample(
                spark, inbox, ckpt, plain_store, None, args.buckets), 3))
        record["plain_store_mid_tier"] = {
            "store_rows": mid,
            "batch_sec_samples": plain_samples,
            "batch_sec_median": round(
                statistics.median(plain_samples[1:]), 3),
            "note": "no bucket layout: the anti-join must shuffle "
                    "store-side fingerprints every batch (plan pinned "
                    "in tests/test_streaming_dedup.py); recorded for "
                    "the layout-cost comparison, not gated",
            "interpretation": "at MB-scale state the plain path is "
                    "FASTER: the bucketed append pays fixed "
                    "saveAsTable catalog + per-bucket sort overhead "
                    "every batch, while shuffling a sub-GB fp column "
                    "is nearly free. The bucketed layout's win is "
                    "asymptotic — it removes the O(store) per-batch "
                    "Exchange, which is the term that matters when "
                    "the store is TBs, not the constant. Pick the "
                    "layout by store size: plain under ~10M fps, "
                    "bucketed beyond.",
        }
        print(f"plain store @ {mid}: samples {plain_samples}")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()

    record["ok"] = not failures
    if failures:
        record["failures"] = failures
    OUT.write_text(json.dumps(record, indent=1) + "\n")
    for f in failures:
        print("BREACH:", f)
    print(f"wrote {OUT}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
