"""Diagnose the semantic-dedup heavy-tail variance (VERDICT r11
item 7): `semantic_dedup_apply`/`keeper` swung 4.7s -> 22.1s between
IDENTICAL back-to-back judge runs at sf0.1.

Runs the named queries N times each in FRESH subprocesses (one
SparkSession per run, like bench.py), splitting wall time into the
phases the query actually has:

- fit:   kmeans_centroids (bounded-sample driver-side fit; memoized
         per process, so every fresh process pays it once)
- plan:  query construction after the fit is memoized
- exec:  the terminal count/collect

and reports per-phase min/median/max across runs plus the
max/median-of-rest ratio per query. Run on EXCLUSIVE CPU — any
concurrent Spark invalidates the numbers (SCALE.md rule: probes are
wall-clock gates).

Usage: python tools/variance_probe.py [--runs 4]
                                      [--queries a,b,...]
Writes VARIANCE_probe.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {root!r})
t0 = time.perf_counter()
from tpg_weather_etl_spark.session import get_spark
spark = get_spark(app_name="variance-probe")
spark.sparkContext.setLogLevel("ERROR")
t_spark = time.perf_counter() - t0

sf = {sf!r}
name = {name!r}

from tpg_weather_etl_spark.sources.tables import read_table
from tpg_weather_etl_spark.queries_embeddings import kmeans_centroids
t0 = time.perf_counter()
e = read_table(spark, sf, "embeddings")
kmeans_centroids(spark, e, cache_key=sf).count()
t_fit = time.perf_counter() - t0

from tpg_weather_etl_spark.registry import all_queries
t0 = time.perf_counter()
df = all_queries()[name](spark, sf)
t_plan = time.perf_counter() - t0
t0 = time.perf_counter()
# same terminal op as bench.py: full materialization, no driver rows
df.write.format("noop").mode("overwrite").save()
t_exec = time.perf_counter() - t0
print(json.dumps({{"spark_up": round(t_spark, 3),
                   "fit": round(t_fit, 3),
                   "plan": round(t_plan, 3),
                   "exec": round(t_exec, 3)}}))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--queries",
                    default="semantic_dedup_apply,"
                            "semantic_dedup_keeper,pagerank_parts")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    out: dict[str, list[dict]] = {}
    for name in args.queries.split(","):
        runs = []
        for i in range(args.runs):
            code = _CHILD.format(root=str(ROOT), sf=args.sf, name=name)
            p = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True)
            line = [ln for ln in p.stdout.splitlines()
                    if ln.startswith("{")]
            if not line:
                print(f"{name} run {i}: FAILED\n{p.stderr[-2000:]}")
                return 1
            rec = json.loads(line[-1])
            runs.append(rec)
            print(f"{name} run {i}: {rec}")
        out[name] = runs

    summary = {}
    for name, runs in out.items():
        ex = sorted(r["exec"] for r in runs)
        med = ex[len(ex) // 2]
        summary[name] = {
            "exec_sec": [r["exec"] for r in runs],
            "fit_sec": [r["fit"] for r in runs],
            "exec_max_over_median": round(ex[-1] / max(med, 0.01), 2),
        }
        print(f"{name}: exec {ex[0]:.2f}..{ex[-1]:.2f}s "
              f"(max/median {summary[name]['exec_max_over_median']}x)")

    (ROOT / "VARIANCE_probe.json").write_text(
        json.dumps({"runs": out, "summary": summary}, indent=1) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
