"""Stateful-streaming state-store probe: heap vs RocksDB provider
as KEY CARDINALITY grows (round 14).

SCALE.md rule 14 measured the incremental-dedup store (a TABLE the
stream anti-joins); this probe measures the other kind of streaming
state — the per-key state STORE behind applyInPandasWithState
(streaming/stateful.py EWMA). Its 100 TB hazard is specific: the
default HDFSBackedStateStoreProvider holds every key's state row on
the executor HEAP, so store bytes grow linearly with key cardinality
until the executor OOMs; RocksDBStateStoreProvider
(streaming/state_store.py) moves the store to executor local disk
with bounded memory. The probe records, per provider, per tier of
key cardinality:

- wall-clock for one availableNow batch carrying 2 events/key
  (fresh inbox + checkpoint per sample; first sample discarded,
  median of the rest) — gated: per-key cost must be flat, i.e.
  latency ratio per key-DOUBLING <= 2x * slack (the batch grows
  WITH the tier here, unlike rule 14's fixed batch);
- the state operator's own telemetry: numRowsTotal (must equal the
  key count — state really is per-key) and the provider's memory
  metrics (heap: memoryUsedBytes growing linearly = the measured
  OOM trajectory; rocksdb: sst-file/pinned-block bytes = the same
  state held off-heap);
- output parity: both providers must produce identical EWMA results
  (count + value checksum) — the store is a storage engine under
  identical operator semantics, so any divergence is a bug;
- the rocksdb/heap wall ratio (recorded + loosely gated) — the
  constant-factor price of the scale-safe provider at toy state,
  mirroring rule 14's layout-honesty row.

Writes STRESS_state_store.json at the repo root; exit 1 on breach.

Usage: python tools/stress_state_store.py [--keys 50000,100000,200000]
                                          [--samples 3]

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

# Batch size scales with the tier (2 events per key), so the flat-
# per-key gate allows 2x wall per key-doubling plus probe slack.
LATENCY_GROWTH_MAX = 2.0 * 1.3
# The scale-safe provider may cost a constant factor at toy state;
# past ~5x it would be mis-set up (e.g. changelog off), not a price.
ROCKSDB_OVERHEAD_MAX = 5.0
OUT = ROOT / "STRESS_state_store.json"


def _write_inbox(inbox: Path, keys: int) -> None:
    """CSV drop files: two events per key in one availableNow batch
    (no maxFilesPerTrigger — the whole inbox is one micro-batch, so
    state holds every key and update-mode emits once per key)."""
    inbox.mkdir(parents=True, exist_ok=True)
    header = "line_text,sched_ts,delay_min"
    per_file = 50_000
    lines: list[str] = []
    fi = 0
    for k in range(keys):
        lines.append(f"k{k:07d},2024-02-01 08:00:00,1.0")
        lines.append(f"k{k:07d},2024-02-01 08:05:00,2.0")
        if len(lines) >= per_file:
            (inbox / f"drop_{fi:05d}.csv").write_text(
                "\n".join([header] + lines))
            lines, fi = [], fi + 1
    if lines:
        (inbox / f"drop_{fi:05d}.csv").write_text(
            "\n".join([header] + lines))


def _run_sample(spark, inbox: Path, ckpt: Path, sink: str):
    """One availableNow pass; returns (wall_sec, last_progress)."""
    from tpg_weather_etl_spark.streaming.stateful import delay_ewma_by_line

    stream = (
        spark.readStream.schema(
            "line_text string, sched_ts timestamp, delay_min double")
        .option("header", "true")
        .csv(str(inbox))
    )
    t0 = time.monotonic()
    q = (
        delay_ewma_by_line(stream)
        .writeStream.format("memory").queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    done = q.awaitTermination(1800)
    if not done:
        q.stop()
        raise SystemExit("sample stream did not terminate in 1800s")
    if q.exception() is not None:
        raise SystemExit(f"sample stream failed: {q.exception()}")
    return time.monotonic() - t0, q.lastProgress


def _state_telemetry(progress: dict) -> dict:
    ops = (progress or {}).get("stateOperators") or []
    if not ops:
        return {}
    op = ops[0]
    custom = op.get("customMetrics") or {}
    out = {
        "num_rows_total": op.get("numRowsTotal"),
        "heap_memory_used_bytes": op.get("memoryUsedBytes"),
    }
    rocks = {k: v for k, v in custom.items()
             if k.lower().startswith("rocksdb")
             and ("bytes" in k.lower() or "usage" in k.lower())}
    if rocks:
        out["rocksdb_bytes_metrics"] = rocks
    return out


def _checksum(spark, sink: str):
    row = spark.sql(
        f"SELECT COUNT(*) AS n, SUM(n_events) AS ne, "
        f"ROUND(SUM(ewma_delay_min), 6) AS se FROM {sink}").collect()[0]
    return int(row.n), int(row.ne), float(row.se)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", default="50000,100000,200000")
    ap.add_argument("--samples", type=int, default=3,
                    help="per provider/tier; first is warm-up, median "
                         "of the rest is recorded")
    args = ap.parse_args()
    tiers = [int(s) for s in args.keys.split(",") if s]

    from tpg_weather_etl_spark.session import get_spark
    from tpg_weather_etl_spark.streaming.state_store import (
        use_default_state_store, use_rocksdb_state_store)

    spark = get_spark(app_name="stress_state_store")
    spark.sparkContext.setLogLevel("ERROR")

    work = ROOT / "stress_state_store_work"
    shutil.rmtree(work, ignore_errors=True)
    work.mkdir()

    record: dict = {"tiers_keys": tiers, "events_per_key": 2,
                    "samples_per_cell": args.samples,
                    "gate_latency_growth_max": LATENCY_GROWTH_MAX,
                    "gate_rocksdb_overhead_max": ROCKSDB_OVERHEAD_MAX}
    failures: list[str] = []
    medians: dict[tuple[str, int], float] = {}
    checksums: dict[tuple[str, int], tuple] = {}

    try:
        for n in tiers:
            inbox = work / f"inbox_{n}"
            _write_inbox(inbox, n)
            for provider in ("heap", "rocksdb"):
                if provider == "rocksdb":
                    use_rocksdb_state_store(spark, bounded_memory_mb=1024)
                else:
                    use_default_state_store(spark)
                samples: list[float] = []
                telemetry: dict = {}
                try:
                    for s in range(args.samples):
                        sink = f"sss_{provider}_{n}_{s}"
                        ckpt = work / f"ckpt_{provider}_{n}_{s}"
                        wall, progress = _run_sample(
                            spark, inbox, ckpt, sink)
                        samples.append(round(wall, 3))
                        telemetry = _state_telemetry(progress)
                        cs = _checksum(spark, sink)
                        if cs[0] != n or cs[1] != 2 * n:
                            failures.append(
                                f"{provider}@{n}: output {cs[0]} keys /"
                                f" {cs[1]} events, expected {n}/{2*n}")
                        checksums[(provider, n)] = cs
                        spark.catalog.dropTempView(sink)
                finally:
                    use_default_state_store(spark)
                med = round(statistics.median(samples[1:] or samples), 3)
                medians[(provider, n)] = med
                rows_in_store = telemetry.get("num_rows_total")
                if rows_in_store is not None and int(rows_in_store) != n:
                    failures.append(
                        f"{provider}@{n}: state store holds "
                        f"{rows_in_store} rows, expected {n} per-key "
                        f"entries")
                record[f"{provider}_{n}"] = {
                    "wall_sec_samples": samples,
                    "wall_sec_median": med,
                    "state_telemetry": telemetry,
                }
                print(f"{provider}@{n}: samples {samples} -> {med}s, "
                      f"state {telemetry}")

            h, r = checksums[("heap", n)], checksums[("rocksdb", n)]
            if h != r:
                failures.append(
                    f"provider divergence at {n} keys: heap {h} vs "
                    f"rocksdb {r} — state engine changed operator "
                    f"output")

        for provider in ("heap", "rocksdb"):
            ratios = {}
            for a, b in zip(tiers, tiers[1:]):
                ra = medians[(provider, a)]
                rb = medians[(provider, b)]
                ratio = round(rb / ra, 3) if ra else 0.0
                ratios[f"{a}->{b}"] = ratio
                gate = LATENCY_GROWTH_MAX ** math.log2(max(2.0, b / a))
                if ratio > gate:
                    failures.append(
                        f"{provider}: wall grew {ratio}x on {b/a:.0f}x "
                        f"keys ({a}->{b}) > {gate:.2f}x gate — per-key "
                        f"cost is growing with cardinality")
            record[f"{provider}_latency_ratios"] = ratios

        overhead = {}
        for n in tiers:
            h = medians[("heap", n)]
            ov = round(medians[("rocksdb", n)] / h, 3) if h else 0.0
            overhead[str(n)] = ov
            if ov > ROCKSDB_OVERHEAD_MAX:
                failures.append(
                    f"rocksdb {ov}x heap wall at {n} keys > "
                    f"{ROCKSDB_OVERHEAD_MAX}x — provider mis-set-up, "
                    f"not a constant price")
        record["rocksdb_over_heap_wall"] = overhead
        record["interpretation"] = (
            "heap_memory_used_bytes grows ~linearly with keys under "
            "the default provider — the measured OOM trajectory that "
            "caps heap-backed state at executor memory; rocksdb holds "
            "the same per-key rows (num_rows_total identical, outputs "
            "checksum-identical) off-heap at a recorded constant-"
            "factor wall cost. Pick the provider by key cardinality, "
            "same shape as rule 14's store-layout rule.")
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
