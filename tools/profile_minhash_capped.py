"""Stage-level profile of q_minhash_pairs_capped growth (VERDICT r12
item 4): STRESS_curation measured the capped variant at 2.57x on 2x
docs ([500k -> 1M], tripwire 3.0) while the UNCAPPED candidate volume
grew 3.97x. Before tuning anything, decompose WHICH stage grows:

  1. sig      — shared shingle + 32-hash signature build (linear claim)
  2. bands    — band projection + hot-bucket filter (linear claim)
  3. cand     — capped band self-join + distinct (the suspect: buckets
                below the cap still grow ~2x per doubling, so their
                pair contribution grows ~4x until they cross the cap
                and get dropped — transitional superlinearity with a
                hard ceiling of cap^2/2 x linearly-many buckets)
  4. verify   — exact-Jaccard verify over the capped candidates
                (cost tracks capped candidate volume)

Also records, per size, the capped candidate count, the kept/dropped
bucket census, and the THEORETICAL kept pair volume (sum s(s-1)/2
over kept buckets) — the number the transitional-growth explanation
predicts and the cap bounds.

Writes PROFILE_minhash_capped.json. Probe only — no gates; the
decision (auto-scale vs documented bound) is made on its record.

Usage: python tools/profile_minhash_capped.py [--base 500000]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def _write_docs(n_docs: int, out_dir: Path) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tools.stress_similarity import gen_corpus

    rng = np.random.default_rng(7)
    rows, _ = gen_corpus(n_docs, rng)
    shutil.rmtree(out_dir, ignore_errors=True)
    out_dir.mkdir(parents=True)
    texts = [" ".join(w) for _, w in rows]
    pq.write_table(pa.table({
        "doc_id": pa.array([d for d, _ in rows], pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array([["en", "fr", "de", "es", "zh"][d % 5]
                          for d, _ in rows]),
        "source": pa.array([f"src{d % 20}" for d, _ in rows]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), out_dir / "documents.parquet")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=500_000)
    ap.add_argument("--tiers", type=int, default=3)
    args = ap.parse_args()

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from tpg_weather_etl_spark.caching import release_all, track
    from tpg_weather_etl_spark.queries_text import (
        MH_BUCKET_CAP,
        _mh_reduce_once,
        _pair_jaccard,
        _shingle_df_shared,
        bands_from_signatures,
        filter_hot_band_buckets,
        minhash_signatures_shared,
    )
    from tpg_weather_etl_spark.session import get_spark

    spark = get_spark(app_name="profile_minhash_capped")
    spark.sparkContext.setLogLevel("ERROR")

    sizes = [args.base * (2 ** i) for i in range(args.tiers)]
    stages = ["sig", "bands", "cand", "verify"]
    timings: dict[str, dict[int, float]] = {s: {} for s in stages}
    census: dict[int, dict] = {}

    for n in sizes:
        out_dir = Path(f"/tmp/spark_graft_profile_mhc_{n}")
        _write_docs(n, out_dir)
        print(f"== {n} docs ==", flush=True)
        d = str(out_dir)

        t0 = time.perf_counter()
        sig = minhash_signatures_shared(spark, d)
        n_sig = sig.count()
        timings["sig"][n] = round(time.perf_counter() - t0, 2)
        print(f"  sig: {timings['sig'][n]}s ({n_sig} rows)", flush=True)

        # census over the UNFILTERED band table (one agg, band-sized)
        raw_bands = bands_from_signatures(sig)
        bsz = raw_bands.groupBy("band", "bkey").agg(
            F.count(F.lit(1)).alias("s"))
        crow = bsz.agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(F.when(F.col("s") > MH_BUCKET_CAP, 1).otherwise(0)
                  ).alias("n_dropped"),
            F.sum(F.when(F.col("s") <= MH_BUCKET_CAP,
                         F.col("s") * (F.col("s") - 1) / 2)
                  .otherwise(0)).alias("kept_pair_vol"),
            F.sum(F.when(F.col("s") > MH_BUCKET_CAP,
                         F.col("s") * (F.col("s") - 1) / 2)
                  .otherwise(0)).alias("dropped_pair_vol"),
            F.max("s").alias("max_bucket"),
            F.sum(F.when((F.col("s") > MH_BUCKET_CAP / 2)
                         & (F.col("s") <= MH_BUCKET_CAP), 1)
                  .otherwise(0)).alias("n_near_cap"),
        ).collect()[0]
        census[n] = {k: int(crow[k] or 0) for k in
                     ("n_buckets", "n_dropped", "max_bucket",
                      "n_near_cap")}
        census[n]["kept_pair_vol"] = int(crow["kept_pair_vol"] or 0)
        census[n]["dropped_pair_vol"] = int(
            crow["dropped_pair_vol"] or 0)
        print(f"  census: {census[n]}", flush=True)

        t0 = time.perf_counter()
        bands = filter_hot_band_buckets(raw_bands, cap=MH_BUCKET_CAP)
        n_bands = bands.count()
        timings["bands"][n] = round(time.perf_counter() - t0, 2)
        print(f"  bands: {timings['bands'][n]}s ({n_bands} rows)",
              flush=True)

        a = bands.select(F.col("doc_id").alias("doc_a"), "band", "bkey")
        b = bands.select(F.col("doc_id").alias("doc_b"),
                         F.col("band").alias("band_b"),
                         F.col("bkey").alias("bkey_b"))
        t0 = time.perf_counter()
        cand = track(
            a.join(b, (F.col("band") == F.col("band_b"))
                   & (F.col("bkey") == F.col("bkey_b"))
                   & (F.col("doc_a") < F.col("doc_b")))
            .select("doc_a", "doc_b").distinct()
            .persist(StorageLevel.MEMORY_AND_DISK))
        n_cand = cand.count()
        timings["cand"][n] = round(time.perf_counter() - t0, 2)
        census[n]["capped_cand_distinct"] = n_cand
        print(f"  cand: {timings['cand'][n]}s ({n_cand} pairs)",
              flush=True)

        t0 = time.perf_counter()
        sh = _shingle_df_shared(spark, d)
        reduce_once = _mh_reduce_once(spark, d)
        # tau mirrors production (optimization r15): the exact
        # size-ratio prefilter rejects verify-certain losers before
        # the intersection join; verified_pairs must stay IDENTICAL
        # to pre-prefilter records (the prefilter is exact)
        n_pairs = (_pair_jaccard(sh, cand=cand,
                                 reduce_once=reduce_once, tau=0.5)
                   .filter(F.col("jaccard") >= 0.5).count())
        timings["verify"][n] = round(time.perf_counter() - t0, 2)
        census[n]["reduce_once"] = bool(reduce_once)
        census[n]["verified_pairs"] = n_pairs
        print(f"  verify: {timings['verify'][n]}s ({n_pairs} pairs)",
              flush=True)

        release_all()
        shutil.rmtree(out_dir, ignore_errors=True)

    ratios = {
        s: [round(timings[s][sizes[i + 1]] /
                  max(timings[s][sizes[i]], 0.01), 2)
            for i in range(len(sizes) - 1)]
        for s in stages}
    rec = {
        "sizes": sizes,
        "cap": MH_BUCKET_CAP,
        "timings_sec": {s: {str(k): v for k, v in t.items()}
                        for s, t in timings.items()},
        "step_ratios": ratios,
        "census": {str(k): v for k, v in census.items()},
    }
    (ROOT / "PROFILE_minhash_capped.json").write_text(
        json.dumps(rec, indent=2) + "\n")
    print(json.dumps(rec, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
