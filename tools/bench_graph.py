"""Wall-clock record + regression guard for the iterative graph jobs.

``part_triangles`` and ``pagerank_parts`` are deliberately not in the
``bench.py`` headline (they are 10-20s graph loops at sf0.1 that would
drown the per-query signal of everything else), but loop-discipline
regressions the plan-budget pins cannot see — per-iteration overhead,
checkpoint growth, convergence slowdown — need a wall-clock tripwire.

Running this tool times both queries fresh (noop sink, same
methodology as bench.py) and compares against the committed
``BENCH_graph.json`` record: a query fails the guard when it exceeds
REGRESSION_X x its recorded time AND the delta exceeds MIN_DELTA_SEC
(the same ratio+magnitude rule as tools/bench_guard.py). Pass
``--record`` to overwrite the record with the fresh numbers instead.

Usage: python tools/bench_graph.py [--record] [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

RECORD = ROOT / "BENCH_graph.json"
QUERIES = ["part_triangles", "pagerank_parts", "degree_distribution",
           "clustering_coeff", "edge_jaccard"]
REGRESSION_X = 2.0
MIN_DELTA_SEC = 2.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--record", action="store_true",
                    help="overwrite BENCH_graph.json with this run")
    ap.add_argument("--repeat", type=int, default=1,
                    help="run the full query loop N times and keep "
                         "per-query MEDIANS — the iterative/persist-"
                         "heavy graph queries coin-flip 2-3x run-to-"
                         "run on this box (pagerank_parts measured "
                         "8.8s and 39.1s minutes apart on an idle "
                         "box, round 12); a single-shot record bakes "
                         "that coin flip into the guard baseline. "
                         "Use --repeat 3 when recording.")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from tpg_weather_etl_spark.caching import release_all
    from tpg_weather_etl_spark.registry import all_queries
    from tpg_weather_etl_spark.session import get_spark

    spark = get_spark(app_name="bench_graph")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    samples: dict[str, list[float]] = {q: [] for q in QUERIES}
    for _ in range(max(1, args.repeat)):
        # Warm-up runs at the top of EVERY round, not just once before
        # round 1: release_all() between rounds drops the shared
        # co-purchase persist, so a single up-front warm-up would
        # leave round 1 warm and rounds 2+ cold — per-query medians
        # mixing methodologies (ADVICE r12). Re-warming each round
        # reproduces the single-shot conditions the guard thresholds
        # were calibrated against.
        qs["degree_distribution"](spark, args.sf).write.format(
            "noop").mode("overwrite").save()
        for name in QUERIES:
            t0 = time.perf_counter()
            qs[name](spark, args.sf).write.format("noop").mode(
                "overwrite").save()
            samples[name].append(
                round(time.perf_counter() - t0, 3))
        # repeat rounds start cold w.r.t. the package's persists so
        # each sample measures the same work as a single-shot run
        release_all()
    timings = {q: sorted(ts)[len(ts) // 2] for q, ts in samples.items()}
    if args.repeat > 1:
        print("samples:", json.dumps(samples))

    m = re.search(r"sf([0-9.]+)", args.sf)
    fresh = {
        "metric": "graph_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(m.group(1)) if m else -1.0,
    }
    print(json.dumps(fresh))

    if args.record or not RECORD.exists():
        RECORD.write_text(json.dumps(fresh, indent=2) + "\n")
        print(f"recorded -> {RECORD.name}")
        return 0

    old = json.loads(RECORD.read_text())["queries"]
    bad = []
    for name, t in timings.items():
        o = old.get(name)
        if o and t > REGRESSION_X * o and t - o > MIN_DELTA_SEC:
            bad.append(f"{name}: {o}s -> {t}s ({t / o:.2f}x)")
    if bad:
        print("GRAPH BENCH REGRESSION:\n  " + "\n  ".join(bad))
        return 1
    print(f"guard OK vs recorded (total {fresh['value']}s "
          f"vs {json.loads(RECORD.read_text())['value']}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
