"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
the JSON record
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
twice: first the full named map (long line), then a COMPACT final
line sized to survive the driver's ~2000-char stdout-tail record,
with all timings as a `times` array aligned to the committed
append-only manifest BENCH_names.json and a named canary/graph/top-10
subset inline.

Each query is fully materialized with the noop sink (no driver-side
collect, no disk write) so the measured time is scan+compute+shuffle.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from tpg_weather_etl_spark.registry import all_queries  # noqa: E402
from tpg_weather_etl_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family, heaviest variants.
HEADLINE = [
    "pricing_summary",
    "top_orders",
    "region_revenue",
    "agg_by_bin",
    "dedupe_priority",
    "latest_per_user",
    "rolling_7d",
    "asof_join",
    "minhash_pairs",
    "ngram_jaccard_pairs",
    "embedding_topk",
    "embedding_neardup_multi",
    "ivf_topk",
    "kmeans_ivf_topk",
    "text_stats",
    "gopher_quality",
    "sessionize",
    "tfidf_top_terms",
    "dedup_clusters",
    # round-2 additions: heaviest of the new operator families
    "chunk_dedup",
    "sequence_pack",
    "interval_join",
    "gap_fill_forward",
    "session_window_agg",
    "pii_redact",
    "char_fingerprints",
    "tokenized_docs",
    # round-4 additions
    "containment_pairs",
    "dedup_keeper",
    # round-5 additions
    "dedup_apply",
    "semantic_dedup_keeper",
    "semantic_dedup_apply",
    "bm25_topk",
    "dup_span_fraction",
    "dup_span_apply",
    "trend_by_type",
    "cube_revenue",
    "gap_fill_interpolate",
    "disjunctive_pred_revenue",
    "idle_customer_balance",
    "promo_revenue",
    "volume_shipping",
    "market_share",
    "returned_items",
    "token_budget_sample",
    # round-5 fourth batch: basket analytics, skyline, quantized ANN.
    # The graph loops live in GRAPH below (appended last since round
    # 7) so their 10-20s jobs can't drown the per-query signal here.
    "basket_lift_pairs",
    "skyline_parts",
    "decile_stats",
    "waiting_orders",
    "int8_quant_topk",
    # prefix_jaccard_pairs stays gate-only: its exact uncapped verify
    # is deliberately the expensive baseline-quality variant
    # round-6 additions
    "bpe_merges",
    "heavy_hitters",
    "source_kl_drift",
    "doc_chunks",
    "neardup_eval",
    "cluster_split",
    "bigram_logprob",
    "centroid_shift",
    "ann_recall_eval",
    "rrf_fusion",
    "dedup_rate_by_source",
    "winsorized_stats",
    "source_ks_drift",
    "chi2_source_lang",
    "token_gini",
    "lang_agreement",
    "cluster_size_histogram",
    "embedding_norm_profile",
    # round-7 additions
    "pq_topk",
    "dsir_importance",
    "quality_filter_funnel",
    "temperature_mix_weights",
    "boilerplate_prefixes",
    "char_entropy",
    "source_overlap_jaccard",
    "contrastive_triplets",
    "pack_efficiency",
    "perplexity_filter_apply",
    "ngram_coverage_curve",
    # round-8 additions: the composed lang->quality->dedup->neardup->
    # decontaminate->pack pipeline (stage interaction under one
    # timer), the MinHash estimator-parity audit, and cross-lingual
    # margin mining
    "curation_e2e",
    "minhash_est_accuracy",
    "bitext_mining_pairs",
    "embedding_neardup_capped",
    "jl_topk",
]


# Iterative graph jobs — folded into the headline (VERDICT r6 item 5)
# so the driver-recorded BENCH_r* is the ONE regression surface; they
# run LAST so their 10-20s loops can't perturb the warm-cache timing
# of the fine-grained queries. Opt out with SPARK_GRAFT_BENCH_GRAPH=0
# (tools/bench_graph.py remains the standalone guard for quick runs).
GRAPH = [
    "degree_distribution",
    "pagerank_parts",
    "part_triangles",
    # round-13 (VERDICT r12 item 8): the other two triangle-family
    # consumers join the recorded headline — BENCH_graph remains the
    # standalone quick guard, but the driver-recorded BENCH_r* is the
    # ONE regression surface and these two were only in the sidecar.
    "clustering_coeff",
    "edge_jaccard",
]


# Box-noise canaries: headline queries whose code is byte-unchanged
# across rounds (see SCALE.md rule 4 — driver boxes ran unchanged
# queries at up to 2.27x across rounds). Their round-over-round ratio
# measures the BOX, not the code; tools/bench_guard.py divides every
# comparison by whichever canaries appear in BOTH runs. The first
# three (unchanged since r1) sit at the headline FRONT, which the
# driver's tail-truncated record loses — the last three (unchanged
# since r6, cheap scalar aggs) sit late in the headline so at least
# one canary survives truncation from either end.
CANARIES = ["pricing_summary", "region_revenue", "top_orders",
            "winsorized_stats", "token_gini", "chi2_source_lang"]

# Repeat-median discipline on the MAIN record (VERDICT r12 item 2 —
# SCALE.md rule 12 extended from BENCH_graph to BENCH_r{N}): a single
# disk/scheduler transient on one pass could poison the next round's
# guard baseline (the r11 interval_join 29.6s-vs-0.94s shape). Any
# query whose FIRST pass lands at or above REPEAT_MIN_SEC (the
# measured heavy-tail family — 28 of 87 headline queries at r12) is
# re-timed REPEAT-1 more times and the MEDIAN is recorded. Between
# samples only the query's OWN persists are released
# (caching.mark/release_since), so every sample reproduces single-shot
# conditions: earlier queries' shared caches stay warm (exactly what a
# single pass would see), the query's own reuse points are rebuilt.
# After the last sample the persists remain, so downstream queries see
# the same cache state as a single-pass sweep. Sub-threshold queries
# stay single-pass: their absolute noise is below the guard's
# MIN_DELTA_SEC floor, and tripling them buys nothing.
REPEAT = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3")))
REPEAT_MIN_SEC = float(
    os.environ.get("SPARK_GRAFT_BENCH_REPEAT_MIN_SEC", "3.0"))

# Accepted-regression stamp (ADVICE r13, bench_guard.py:69): the
# guard's contamination floor anchors on the per-query MIN over the
# last 3 records, so a DELIBERATE code change that slows a query
# >= 4x (a correctness fix that adds a required pass, say) would make
# `select_baseline` reject every post-change record until the fast
# pre-change times age out of every candidate's lookback window —
# rounds of false "contaminated baseline" alarms on healthy records.
# Stamping the query here (name -> one-line reason, which rides in
# the record) tells the guard the slowdown is acknowledged code, not
# box contention: stamped names are excluded from the contamination
# floor AND from the per-query regression failure (shared totals
# still count them, so an unbounded blowup is still caught). Remove
# a stamp once the new time has aged into the lookback floor
# (~3 driver rounds).
# (Host-profile shifts across reboots are NOT stamped here: the
# guard's epoch fence — bench_guard.record_is_cross_epoch — detects a
# baseline from a previous boot mechanically and relaxes per-query
# gates to catastrophe backstops, so stamps stay reserved for
# deliberate code slowdowns.)
ACCEPTED_REGRESSIONS: dict[str, str] = {}


# Second recorded tier (VERDICT r8 item 5): every bench run also
# times the ROTATION_SIZE registry queries with the OLDEST wall-clock
# record among those not in the headline, appending to
# BENCH_rotation.json. ~100 non-headline queries / 20 per run means
# every query has a time-series point within ~5 rounds. Rotation
# timings stay OUT of the printed JSON line (the driver's record
# format is tail-truncated; the sidecar is the durable copy).
ROTATION_SIZE = 20


def _rotation_pick(all_names: list[str], sidecar: dict) -> list[str]:
    pool = [n for n in all_names
            if n not in set(HEADLINE) | set(GRAPH)]
    hist = sidecar.get("history", {})
    # last_attempt covers queries whose run ERRORED: without it a
    # permanently-broken query keeps last_run=0 and wins a rotation
    # slot every run, starving the recording tier (ADVICE r9).
    att = sidecar.get("last_attempt", {})
    last_run = {n: max(hist[n][-1][0] if hist.get(n) else 0,
                       int(att.get(n, 0))) for n in pool}
    pool.sort(key=lambda n: (last_run[n], n))
    return pool[:ROTATION_SIZE]


def _run_rotation(spark, qs, sf_dir: str, headline: dict[str, float],
                  root: Path, sf: float) -> None:
    path = root / "BENCH_rotation.json"
    try:
        sidecar = json.loads(path.read_text())
    except (OSError, ValueError):
        sidecar = {"run": 0, "history": {}, "errors": {}}
    names = _rotation_pick(list(qs), sidecar)
    run_no = int(sidecar.get("run", 0)) + 1
    for name in names:
        sidecar.setdefault("last_attempt", {})[name] = run_no
    # the run's canary total rides along with every sample so a
    # consumer can normalize cross-run comparisons (same discipline
    # as bench_guard's live normalization)
    canary_total = round(sum(headline.get(c, 0.0) for c in CANARIES), 3)
    for name in names:
        t0 = time.perf_counter()
        try:
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
        except Exception as exc:  # noqa: BLE001 — rotation is a
            # recording tier; one broken query must not sink the run
            sidecar.setdefault("errors", {})[name] = (
                f"run {run_no}: {type(exc).__name__}: {exc}"[:500])
            continue
        sec = round(time.perf_counter() - t0, 3)
        # sample = [run, sec, canary_total, sf]: canary_total lets a
        # consumer divide out box noise; sf keeps local small-scale
        # test runs distinguishable from driver sf0.1 records
        sidecar.setdefault("history", {}).setdefault(name, []).append(
            [run_no, sec, canary_total, sf])
        sidecar["history"][name] = sidecar["history"][name][-10:]
        sidecar.setdefault("errors", {}).pop(name, None)
    sidecar["run"] = run_no
    hist = sidecar.get("history", {})
    pool = [n for n in qs if n not in set(HEADLINE) | set(GRAPH)]
    sidecar["last_benched_run"] = {
        n: (hist[n][-1][0] if hist.get(n) else None) for n in pool}
    sidecar["canaries"] = CANARIES
    path.write_text(json.dumps(sidecar, indent=1, sort_keys=True) + "\n")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = all_queries()
    timed = list(HEADLINE)
    if os.environ.get("SPARK_GRAFT_BENCH_GRAPH", "1") != "0":
        timed += GRAPH
    names = [n for n in timed if n in qs]
    # A/B instrumentation (round-6 drift investigation): run only a
    # comma-separated subset, preserving HEADLINE order. The driver
    # never sets this, so recorded BENCH_r* runs are always the full
    # headline.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = {s.strip() for s in only.split(",") if s.strip()}
        names = [n for n in names if n in keep]
        if not names:
            raise SystemExit(
                f"SPARK_GRAFT_BENCH_ONLY={only!r} matches no benched "
                f"query; valid names: {', '.join(timed)}")

    # Warm the JVM + parquet footers with a FIXED cheap query — not
    # names[0], which changes with SPARK_GRAFT_BENCH_ONLY and would
    # skew A/B comparisons of whichever query runs first.
    qs[HEADLINE[0]](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()

    from tpg_weather_etl_spark.caching import live_since, mark, release_since

    def _sample(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite").save()
        return time.perf_counter() - t0

    timings: dict[str, float] = {}
    samples_map: dict[str, list[float]] = {}
    # Cold-vs-warm honesty annotation (optimization r15, VERDICT r14
    # item 8): per query, how many shared cache registrations
    # (persists + result handles) it left LIVE for later queries — the
    # query that PAID each family's cache build in this sweep. Rides
    # only in the full record; no timing change.
    cache_builds: dict[str, int] = {}
    failure: str | None = None
    try:
        for name in names:
            marker = mark()
            try:
                samples = [_sample(name)]
                if REPEAT > 1 and samples[0] >= REPEAT_MIN_SEC:
                    for _ in range(REPEAT - 1):
                        # cold w.r.t. this query's own persists only;
                        # shared caches from earlier queries stay
                        release_since(marker)
                        samples.append(_sample(name))
            except Exception as exc:  # noqa: BLE001
                # Round-3 lesson: a crash that records NOTHING destroys
                # the whole round's perf evidence. Keep the partial
                # timings, mark the failure, and still emit the JSON.
                failure = f"{name}: {type(exc).__name__}: {exc}"
                break
            timings[name] = round(statistics.median(samples), 3)
            if len(samples) > 1:
                samples_map[name] = [round(s, 3) for s in samples]
            built = live_since(marker)
            if built:
                cache_builds[name] = built
        # rotation tier runs after the full headline (incl. graph) so
        # it can't perturb the recorded per-query signal, and inside
        # the try so release_all still covers its persisted
        # intermediates
        if (failure is None and not only
                and os.environ.get("SPARK_GRAFT_BENCH_ROTATION", "1")
                != "0"):
            _run_rotation(spark, qs, sf_dir, timings,
                          Path(__file__).resolve().parent, sf)
    finally:
        # Free every persisted intermediate accumulated by the sweep
        # (deliberately AFTER all queries: dedup_clusters reuses the
        # minhash edge cache within the sweep). In the finally block so
        # a mid-sweep failure can't leak tracked persists for the
        # session lifetime.
        from tpg_weather_etl_spark.caching import release_all
        release_all()

    total = round(sum(timings.values()), 3)
    record = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # Methodology stamp + raw samples (medians are what `queries`
        # holds; the samples let a reader audit a suspect median).
        "repeat": {"n": REPEAT, "min_sec": REPEAT_MIN_SEC},
        "samples": samples_map,
        # which queries paid a shared cache build this sweep (count of
        # live persist/handle registrations they created) — their
        # recorded time is cold build+consume; family members after
        # them read warm (VERDICT r14 item 8)
        "cache_builds": cache_builds,
    }
    if ACCEPTED_REGRESSIONS:
        record["accepted_regressions"] = dict(
            sorted(ACCEPTED_REGRESSIONS.items()))
    if failure is not None:
        record["error"] = failure[:2000]
    root = Path(__file__).resolve().parent
    # Sidecar copy: the full parsed record, committed each round, so
    # no local consumer depends on the driver's stdout buffer.
    root.joinpath("BENCH_last_parsed.json").write_text(
        json.dumps(record, indent=1) + "\n")

    # The driver's record keeps only the LAST ~2000 chars of stdout
    # (BENCH_r07-r09 each lost the head of the single long JSON line:
    # r9 preserved 74 of 87 timings). The full named map alone is
    # >2000 chars, so no one-line format with inline names can ever
    # survive. Fix (VERDICT r9 item 4): print the full record FIRST
    # (best-effort copy), then a COMPACT line, guaranteed under the
    # tail window, carrying 100% of the timings as a `times` array
    # aligned to the append-only name manifest BENCH_names.json
    # (committed; names are appended in first-benched order and never
    # reordered, so old driver records stay decodable), plus a named
    # subset (canaries + graph + top-10 by time) readable without the
    # manifest.
    man_path = root / "BENCH_names.json"
    try:
        manifest = json.loads(man_path.read_text())["names"]
    except (OSError, ValueError, KeyError):
        manifest = []
    new_names = [n for n in names if n in timings and n not in
                 set(manifest)]
    if new_names:
        manifest = manifest + new_names
        man_path.write_text(
            json.dumps({"names": manifest}, indent=1) + "\n")
    idx = {n: i for i, n in enumerate(manifest)}
    times: list[float | None] = [None] * len(manifest)
    for n, v in timings.items():
        if n in idx:
            times[idx[n]] = v
    top10 = sorted(timings, key=timings.get, reverse=True)[:10]
    subset = {n: timings[n] for n in (*CANARIES, *GRAPH, *top10)
              if n in timings}
    compact = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "queries": subset,
        "times": times,
        "names": "BENCH_names.json",
        "n_timed": len(timings),
    }
    if ACCEPTED_REGRESSIONS:
        compact["accepted_regressions"] = sorted(ACCEPTED_REGRESSIONS)
    if failure is not None:
        compact["error"] = failure[:300]
    print(json.dumps(record))
    out = json.dumps(compact, separators=(",", ":"))
    # Hard guarantee, not a hope: the compact line must fit the
    # driver's tail window with margin. Trim the named subset first,
    # never the times array.
    while len(out) > 1800 and subset:
        subset.pop(next(iter(subset)))
        out = json.dumps(compact, separators=(",", ":"))
    print(out)
    if failure is not None:
        sys.exit(1)


if __name__ == "__main__":
    main()
