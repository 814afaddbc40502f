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
    for i in range(len(recs) - 1, 0, -1):
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", type=Path, default=None)
    args = ap.parse_args()

    base_path = args.baseline or select_baseline()
    if base_path is None:
        print("no recorded BENCH_r*.json to compare against")
        return 0
    base = load_recorded(base_path)

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
    for n in shared:
        if n in ACCEPTED_REGRESSIONS:
            continue
        norm = new_q[n] / canary
        if (norm > REGRESSION_X * old_q[n]
                and new_q[n] - old_q[n] > MIN_DELTA_SEC):
            failures.append(
                f"{n}: {new_q[n]:.2f}s raw / {norm:.2f}s normalized vs "
                f"{old_q[n]:.2f}s (> {REGRESSION_X}x normalized and "
                f"> +{MIN_DELTA_SEC}s)")
        elif (new_q[n] > RAW_QUERY_CEILING_X * old_q[n]
                and new_q[n] - old_q[n] > MIN_DELTA_SEC):
            # Raw per-query backstop (ADVICE r9): the canary clamp of
            # 3.0 could normalize a genuine 5x single-query regression
            # down to a pass while the shared-total raw ceiling never
            # notices a query that is a small share of the total.
            failures.append(
                f"{n}: {new_q[n]:.2f}s raw vs {old_q[n]:.2f}s "
                f"(> {RAW_QUERY_CEILING_X}x raw — beyond what the "
                f"canary clamp can explain)")
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
