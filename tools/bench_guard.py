"""Round-over-round bench regression guard.

Runs ``bench.py`` fresh, then compares it against the newest
``BENCH_r*.json`` the driver recorded:

- every query present in both runs must be ≤ REGRESSION_X × its old
  time;
- the total over the SHARED query set must be ≤ REGRESSION_X × the
  old shared total (new headline queries are reported but can't fail
  a round they weren't part of).

Exit code 1 on any violation — run this before ending a round.

Usage: python tools/bench_guard.py [--baseline BENCH_r01.json]
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
from pathlib import Path

REGRESSION_X = 2.0
# A per-query regression must ALSO exceed this absolute delta: local
# wall-clock on a shared box jitters sub-second queries by far more
# than 2x run to run; only a ratio+magnitude breach is signal.
MIN_DELTA_SEC = 2.0
# Backstop on the RAW (un-normalized) shared total: if the box is so
# slow that even canary-normalization can't explain it, fail anyway.
RAW_CEILING_X = 3.0
# Per-query raw backstop: a single query slower than this many times
# its recorded time fails even if canary normalization would excuse
# it (the clamp below caps the excuse at 3x; 4x raw + MIN_DELTA_SEC
# is outside any box-noise explanation we've measured).
RAW_QUERY_CEILING_X = 4.0
# Canary ratio is clamped to this band — a canary that itself
# regresses catastrophically must not normalize real regressions away.
CANARY_CLAMP = (0.33, 3.0)
# Baseline-contamination gate (round 12, VERDICT r11 item 3): a
# recorded bench whose per-query times contain >= this-x outliers vs
# the PREVIOUS record was measured on a contended box (BENCH_r11:
# interval_join 29.6s vs 0.94s on unchanged code) and must not be
# anointed as the next guard baseline — an inflated baseline masks
# real regressions for a round.
CONTAMINATION_X = 4.0

ROOT = Path(__file__).resolve().parent.parent


def latest_recorded(root: Path = ROOT) -> Path | None:
    # BENCH_r[0-9]*: the driver's numbered records only — NOT the
    # rotation sidecar (BENCH_rotation.json) or other BENCH_* files
    recs = sorted(root.glob("BENCH_r[0-9]*.json"),
                  key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)))
    return recs[-1] if recs else None


# How many prior records each baseline candidate is compared against.
# Adjacent-only comparison (the round-12 version) had a blind spot:
# two CONSECUTIVE contaminated rounds with similarly inflated times
# (sustained box contention — r(N)=25s, r(N+1)=26s vs clean 1s) show
# no adjacent outlier and the newest contaminated record is anointed.
# Anchoring on the per-query MIN across the last K records means the
# contention would have to persist across K+1 driver rounds (days) to
# slip through.
CONTAMINATION_LOOKBACK = 3

# Epoch fence (round 14): canary normalization assumes the box got
# UNIFORMLY faster/slower, but host profiles can shift non-uniformly
# — measured on this box: scan-bound canaries 1.36-2.41x slower
# across a five-hour window while stage-overhead-heavy queries read
# 2.5-3.5x ON UNCHANGED CODE (A/B-verified in a worktree at the
# prior round's commit; ROUNDS.md r14). A reboot or VM migration is
# the discontinuity most likely to make such a shift PERMANENT, so a
# baseline recorded under a DIFFERENT boot cannot support the strict
# 2x per-query gate: cross-epoch comparisons relax to
# catastrophe-only backstops (a real 10x regression still fails) and
# same-epoch records are preferred as baselines as soon as one
# exists. Same-boot drift is handled separately, by the
# confirmation re-run in main().
CROSS_EPOCH_X = 4.0           # normalized per-query gate, cross-epoch
CROSS_EPOCH_RAW_CEILING_X = 6.0   # raw per-query backstop, cross-epoch


def boot_time() -> float:
    """Epoch start of the current host boot (0.0 if unknowable)."""
    import time
    try:
        with open("/proc/uptime") as f:
            return time.time() - float(f.read().split()[0])
    except (OSError, ValueError, IndexError):
        return 0.0


def record_is_cross_epoch(path: Path) -> bool:
    """True when the record predates the current boot: its absolute
    times were measured under a host profile this boot may not share
    (file mtime is the epoch witness — records are written once, at
    measurement time, and never rewritten)."""
    bt = boot_time()
    try:
        return bt > 0 and path.stat().st_mtime < bt
    except OSError:
        return False


def select_baseline(root: Path = ROOT) -> Path | None:
    """Newest BENCH_r*.json that isn't itself contaminated.

    Walking newest-first, a candidate is REJECTED when any query it
    shares with recent prior records ran > CONTAMINATION_X x the
    per-query MIN over the last CONTAMINATION_LOOKBACK records AND
    > MIN_DELTA_SEC slower than that min — a per-query 4x+multi-second
    jump vs the recent floor on this box is contention, not code
    (judge-measured heavy tail is +/-2-4x only on the handful of
    persist-bound queries; a >=4x jump that DISAPPEARS again in the
    next fresh run is the r11 signature). The min-anchor (not just the
    adjacent record) closes the consecutive-contamination blind spot.
    Falls back to the oldest record rather than returning nothing.

    Accepted-regression escape hatch (ADVICE r13): a LEGITIMATE code
    change that slows a query >= CONTAMINATION_X would otherwise get
    every post-change record rejected until the fast pre-change times
    age out of the lookback window. A record may carry an
    ``accepted_regressions`` stamp (written by bench.py from its
    ACCEPTED_REGRESSIONS map); stamped names are excluded from that
    candidate's contamination-outlier check — the author has signed
    the slowdown as code, not contention.
    """
    recs = sorted(root.glob("BENCH_r[0-9]*.json"),
                  key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)))
    # Same-epoch records first (newest-first within each group): a
    # record measured under the CURRENT boot is a valid strict
    # baseline; cross-epoch records are only a fallback (see the
    # epoch-fence note above — their per-query times may differ
    # 2-3x on unchanged code).
    order = sorted(
        range(len(recs) - 1, 0, -1),
        key=lambda i: (record_is_cross_epoch(recs[i]), -i))
    for i in order:
        cand = recs[i]
        try:
            crec = load_recorded(cand)
            cq = crec["queries"]
        except (ValueError, OSError, SystemExit):
            continue
        accepted = set(crec.get("accepted_regressions") or [])
        floor: dict[str, float] = {}
        prior_names = []
        for prior in recs[max(0, i - CONTAMINATION_LOOKBACK):i]:
            try:
                pq = load_recorded(prior)["queries"]
            except (ValueError, OSError, SystemExit):
                continue
            prior_names.append(prior.name)
            for n, v in pq.items():
                if v > 0:
                    floor[n] = min(floor.get(n, v), v)
        if not floor:
            continue
        outliers = [n for n in cq if n in floor and n not in accepted
                    and cq[n] > CONTAMINATION_X * floor[n]
                    and cq[n] - floor[n] > MIN_DELTA_SEC]
        if not outliers:
            if accepted:
                print(f"note: {cand.name} carries accepted-regression "
                      f"stamps excluded from the contamination check: "
                      f"{sorted(accepted)}")
            return cand
        print(f"note: skipping contaminated baseline {cand.name} — "
              f"{len(outliers)} queries > {CONTAMINATION_X}x vs "
              f"min({', '.join(prior_names)}): "
              + ", ".join(f"{n} {cq[n]:.2f}s vs {floor[n]:.2f}s"
                          for n in sorted(outliers)[:5]))
    return recs[0] if recs else None


def load_recorded(path: Path) -> dict:
    data = json.loads(path.read_text())
    parsed = data.get("parsed") or data
    if "times" in parsed:
        # Compact driver record (round 10+): full timings ride as an
        # array aligned to the append-only BENCH_names.json manifest;
        # the named subset (canaries/graph/top10) overlays it.
        try:
            manifest = json.loads(
                (ROOT / "BENCH_names.json").read_text())["names"]
        except (OSError, ValueError, KeyError):
            manifest = []
        q = {n: float(v) for n, v in zip(manifest, parsed["times"])
             if v is not None}
        q.update({k: float(v)
                  for k, v in parsed.get("queries", {}).items()})
        if q:
            n_timed = parsed.get("n_timed")
            if n_timed is not None and len(q) != n_timed:
                print(f"note: {path.name} decodes {len(q)} of "
                      f"{n_timed} timings (manifest drift)")
            out = {"queries": q}
            acc = parsed.get("accepted_regressions")
            if acc:
                out["accepted_regressions"] = list(acc)
            return out
    if "queries" in parsed:
        return parsed
    # Driver wrapper with a TRUNCATED tail (the stdout buffer cuts the
    # JSON line once the headline passed ~70 queries — BENCH_r07).
    # Recover the per-query timings that survived truncation; the
    # shared-set comparison below is defined over the intersection, so
    # a partial baseline narrows coverage instead of crashing.
    # (bench.py also writes BENCH_last_parsed.json now, but driver
    # records from other machines only carry the tail.)
    tail = data.get("tail", "")
    # Guard the scrape against non-timing '"key": number' pairs (a
    # truncated record can embed an error payload with stray numeric
    # pairs): prefer text after the '"queries": {' anchor; when the
    # tail starts MID-map (the anchor itself was truncated away —
    # BENCH_r08), scan the whole tail but drop the first pair, whose
    # key may be a mid-cut name that collides with a real one (e.g.
    # 'semantic_dedup_apply' cut to 'dedup_apply'). Either way,
    # whitelist keys against the benched-name set.
    anchor = re.search(r'\\?"queries\\?":\s*\{', tail)
    scan = tail[anchor.end():] if anchor else tail
    pairs = re.findall(r'\\?"([a-z0-9_]+)\\?": ([0-9.]+)', scan)
    if not anchor and pairs:
        pairs = pairs[1:]
    sys.path.insert(0, str(ROOT))
    from bench import GRAPH, HEADLINE
    benched = set(HEADLINE) | set(GRAPH)
    q = {k: float(v) for k, v in pairs if k in benched}
    if not q:
        raise SystemExit(
            f"{path} has neither parsed queries nor a parseable tail")
    print(f"note: {path.name} tail-recovered baseline covers "
          f"{len(q)} queries")
    return {"queries": q}


def breaches(name: str, old: float, new: float, canary: float,
             per_query_x: float, raw_ceiling_x: float) -> str | None:
    """The per-query gate, one place for both the first pass and the
    confirmation pass: a breach needs ratio AND absolute magnitude
    (normalized path), or the raw catastrophe backstop (ADVICE r9:
    the canary clamp of 3.0 could normalize a genuine 5x single-query
    regression down to a pass while the shared-total raw ceiling
    never notices a query that is a small share of the total)."""
    norm = new / canary
    if norm > per_query_x * old and new - old > MIN_DELTA_SEC:
        return (f"{name}: {new:.2f}s raw / {norm:.2f}s normalized vs "
                f"{old:.2f}s (> {per_query_x}x normalized and "
                f"> +{MIN_DELTA_SEC}s)")
    if new > raw_ceiling_x * old and new - old > MIN_DELTA_SEC:
        return (f"{name}: {new:.2f}s raw vs {old:.2f}s "
                f"(> {raw_ceiling_x}x raw — beyond what the "
                f"canary clamp can explain)")
    return None


def _canary_ratio(qmap: dict, old_q: dict) -> float:
    from bench import CANARIES
    c_old = sum(old_q[c] for c in CANARIES if c in old_q and c in qmap)
    c_new = sum(qmap[c] for c in CANARIES if c in old_q and c in qmap)
    ratio = c_new / c_old if c_old > 0 else 1.0
    return max(CANARY_CLAMP[0], min(CANARY_CLAMP[1], ratio))


def _run_bench_subset(names: list[str]) -> dict[str, float]:
    """Fresh bench.py process timing only ``names`` (plus its fixed
    warm-up query); returns the timings map, {} on failure. Note:
    bench.py overwrites BENCH_last_parsed.json with the subset —
    that sidecar reflects the LAST bench invocation by design."""
    import os
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = ",".join(names)
    env["SPARK_GRAFT_BENCH_ROTATION"] = "0"
    proc = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")],
        capture_output=True, text=True, env=env)
    if proc.returncode != 0:
        return {}
    best: dict[str, float] = {}
    for ln in proc.stdout.splitlines():
        if ln.startswith("{"):
            try:
                rec = json.loads(ln)
            except ValueError:
                continue
            if len(rec.get("queries", {})) > len(best):
                best = rec["queries"]
    return best


def confirm_suspects(suspects: dict[str, str], old_q: dict,
                     per_query_x: float, raw_ceiling_x: float,
                     runner=None) -> dict[str, str]:
    """Independent replication for flagged queries (round 14).

    Re-times only the suspect queries + the canaries (so the pass
    self-normalizes against ITS OWN box state, not the first pass's)
    in a fresh process, and keeps a failure only if the breach
    reproduces under the same gate. A missing or failed re-run keeps
    the original flag — the confirm pass can only CLEAR with positive
    evidence, never by erroring out.
    """
    names = sorted(set(suspects) | {c for c in _canary_names(old_q)})
    rerun = (runner or _run_bench_subset)(names)
    if not rerun:
        print("confirmation re-run produced no timings — keeping "
              "original flags")
        return dict(suspects)
    canary2 = _canary_ratio(rerun, old_q)
    print(f"confirmation canary ratio: {canary2:.3f}")
    confirmed: dict[str, str] = {}
    for n, first in suspects.items():
        if n not in rerun:
            confirmed[n] = first
            continue
        again = breaches(n, old_q[n], rerun[n], canary2,
                         per_query_x, raw_ceiling_x)
        if again:
            confirmed[n] = (f"{again} [CONFIRMED by independent "
                            f"re-run; first pass: {first}]")
        else:
            print(f"cleared by confirmation re-run: {n} "
                  f"{rerun[n]:.2f}s (first pass had flagged: {first})"
                  f" — transient box drift, not code")
    return confirmed


def _canary_names(old_q: dict) -> list[str]:
    from bench import CANARIES
    return [c for c in CANARIES if c in old_q]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", type=Path, default=None)
    args = ap.parse_args()

    base_path = args.baseline or select_baseline()
    if base_path is None:
        print("no recorded BENCH_r*.json to compare against")
        return 0
    base = load_recorded(base_path)
    cross_epoch = record_is_cross_epoch(base_path)
    per_query_x = CROSS_EPOCH_X if cross_epoch else REGRESSION_X
    raw_ceiling_x = (CROSS_EPOCH_RAW_CEILING_X if cross_epoch
                     else RAW_QUERY_CEILING_X)
    if cross_epoch:
        print(f"note: baseline {base_path.name} predates the current "
              f"boot — cross-epoch comparison; canary normalization "
              f"cannot correct a non-uniform host-profile shift, so "
              f"the per-query gate relaxes to {per_query_x}x "
              f"normalized / {raw_ceiling_x}x raw (catastrophe "
              f"backstop). Record a bench under this boot to restore "
              f"the strict {REGRESSION_X}x gate.")

    proc = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")],
        capture_output=True, text=True, check=True)
    # bench.py prints the full named record first, then the compact
    # driver-tail line — pick whichever parses with the most named
    # timings (the full one, unless something mangled it).
    cands = []
    for ln in proc.stdout.splitlines():
        if ln.startswith("{"):
            try:
                cands.append(json.loads(ln))
            except ValueError:
                pass
    now = max(cands, key=lambda r: len(r.get("queries", {})))
    print(json.dumps({k: v for k, v in now.items() if k != "times"}))

    old_q, new_q = base["queries"], now["queries"]
    shared = [n for n in old_q if n in new_q]

    # Box-noise normalization (SCALE.md rule 4, made mechanical):
    # canaries are byte-unchanged-since-r1 queries, so their ratio is
    # pure box. Gate on ratios AFTER dividing by it, clamped so a
    # genuinely-regressed canary can't normalize everything away.
    sys.path.insert(0, str(ROOT))
    from bench import CANARIES  # single source of truth
    c_old = sum(old_q[c] for c in CANARIES if c in old_q and c in new_q)
    c_new = sum(new_q[c] for c in CANARIES if c in old_q and c in new_q)
    canary = c_new / c_old if c_old > 0 else 1.0
    canary = max(CANARY_CLAMP[0], min(CANARY_CLAMP[1], canary))
    print(f"canary ratio (box noise): {canary:.3f} "
          f"({c_new:.2f}s vs {c_old:.2f}s over "
          f"{[c for c in CANARIES if c in old_q and c in new_q]})")

    # The two iterative graph loops are 10%+ of the headline and the
    # likeliest place a lost checkpoint/persist shows up — surface
    # their normalized ratios every run so one round of driver record
    # is enough to spot a loop-discipline regression (VERDICT r9
    # item 7). ROUNDS.md records these at round close.
    from bench import GRAPH
    gshared = [n for n in GRAPH if n in old_q and n in new_q]
    if gshared:
        print("graph-query normalized ratios: " + ", ".join(
            f"{n} {new_q[n] / canary / old_q[n]:.2f}x "
            f"({new_q[n]:.2f}s raw vs {old_q[n]:.2f}s)"
            for n in gshared))

    # Names the CURRENT code signs as deliberately slower (bench.py
    # ACCEPTED_REGRESSIONS) are exempt from per-query failure against
    # a pre-change baseline; the shared-total gates still include them
    # so an unbounded blowup can't hide behind a stamp.
    from bench import ACCEPTED_REGRESSIONS
    if ACCEPTED_REGRESSIONS:
        print("accepted regressions (per-query gate waived): "
              + ", ".join(f"{n} ({r})"
                          for n, r in sorted(ACCEPTED_REGRESSIONS.items())))

    failures = []
    suspects: dict[str, str] = {}
    for n in shared:
        if n in ACCEPTED_REGRESSIONS:
            continue
        if n in CANARIES:
            # Canaries are byte-unchanged-since-r1 by definition, so a
            # canary breach is ALWAYS box drift, never code — it
            # belongs in the normalization ratio (where it already
            # is), not in the failure list (round 14: two canaries
            # false-failed a close sweep during a measured 2.4x
            # non-uniform drift window).
            continue
        reason = breaches(n, old_q[n], new_q[n], canary,
                          per_query_x, raw_ceiling_x)
        if reason:
            suspects[n] = reason

    # Confirmation pass (round 14): this box's wall-clock drifts
    # non-uniformly up to ~3x on sub-10s queries (SCALE rule 12), so
    # with ~90 gated queries a single-run 2x gate false-fails ~1
    # query per sweep. The repo's own contamination doctrine — "a
    # jump that DISAPPEARS in the next fresh run is contention, not
    # code" (select_baseline docstring) — applied to the live gate:
    # re-measure ONLY the flagged queries (plus canaries, so the
    # confirm pass self-normalizes) in a fresh process, and fail only
    # a breach that REPRODUCES. A real code regression is
    # deterministic and survives; drift does not.
    if suspects:
        print("suspect regressions (pending confirmation re-run): "
              + ", ".join(suspects))
        confirmed = confirm_suspects(
            suspects, old_q, per_query_x, raw_ceiling_x)
        failures.extend(confirmed.values())
    old_total = sum(old_q[n] for n in shared)
    new_total = sum(new_q[n] for n in shared)
    norm_total = new_total / canary
    print(f"shared-set total: {new_total:.1f}s raw / {norm_total:.1f}s "
          f"normalized vs {old_total:.1f}s ({base_path.name}); "
          f"new-only queries: {sorted(set(new_q) - set(old_q))}")
    if norm_total > REGRESSION_X * old_total:
        failures.append(
            f"shared total {norm_total:.1f}s normalized > "
            f"{REGRESSION_X}x {old_total:.1f}s")
    if new_total > RAW_CEILING_X * old_total:
        failures.append(
            f"shared total {new_total:.1f}s raw > "
            f"{RAW_CEILING_X}x {old_total:.1f}s (beyond what box "
            f"noise can explain)")

    for f in failures:
        print("REGRESSION:", f)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
