"""Scale probe for the graph family (round 8, VERDICT r7 task 4).

`part_triangles`, `pagerank_parts`, `degree_distribution`, and the
connected-components loop all claim near-linear scaling because their
per-key work is structurally bounded (degree orientation bounds wedge
fan-out by arboricity; the PageRank/CC loops join a pre-partitioned,
checkpointed edge list against a small frontier). This probe checks
those claims with measurements instead of arguments, mirroring
tools/stress_curation.py:

- generate the same synthetic co-purchase workload at base and 4x
  edge counts (identical generator, scaled) and assert wall-clock
  grows <= RATIO_MAX per query (linear would be ~4.0 on a 4x input;
  a quadratic wedge or join blowup shows ~16x);
- assert `_EDGE_ROWS_PER_PARTITION` sizing actually changes the loop
  partition count at the larger size (the knob is load-bearing, not
  decorative);
- record per-iteration PageRank wall time at both sizes
  (`PAGERANK_ITER_TIMES`): within one run the iterations must stay
  flat — growth would mean the loop is re-shuffling the edge list it
  claims to have pre-partitioned;
- time the CC pointer-jumping loop on the same graphs (the dedup
  cluster operator applied to a co-purchase-shaped edge list).

Writes STRESS_graph.json at the repo root; exit 1 on breach.

Usage: python tools/stress_graph.py [--base-orders 57000]
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

# 4x edges, linear ideal ~4.0; allow generous constant-factor noise
# (JVM, fixed per-stage costs at small absolute times) but fail far
# below a quadratic term's ~16x.
RATIO_MAX = 6.0
BASKET = 5          # distinct parts per order -> C(5,2)=10 pairs
PARTS_PER_ORDER = 7.5   # TPC-H-ish parts:orders ratio (20k:150k)


def _write_graph(n_orders: int, out_dir: Path) -> int:
    """Synthetic lineitem (l_orderkey, l_partkey) co-purchase workload
    with a zipf-skewed part popularity, deterministic in n_orders."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(42)
    n_parts = max(100, int(n_orders / PARTS_PER_ORDER))
    # zipf-ish skew via squared uniform — hot parts exist (the wedge
    # fan-out stressor) without one part touching every order
    draws = (rng.random((n_orders, BASKET)) ** 2 * n_parts).astype(
        np.int64)
    orderkeys = np.repeat(np.arange(1, n_orders + 1), BASKET)
    shutil.rmtree(out_dir, ignore_errors=True)
    out_dir.mkdir(parents=True)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(orderkeys, pa.int64()),
        "l_partkey": pa.array(draws.ravel(), pa.int64()),
    }), out_dir / "lineitem.parquet")
    return n_parts


def main() -> int:
    ap = argparse.ArgumentParser()
    # base ~ sf0.1 scale: 57k orders x ~10 pairs ~= 0.5-0.6M distinct
    # edges (sf0.1's real co-purchase list is 1.2M from 150k orders)
    ap.add_argument("--base-orders", type=int, default=57000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import tpg_weather_etl_spark.queries_ml as QM
    from tpg_weather_etl_spark.caching import release_all
    from tpg_weather_etl_spark.operators.graph import (
        _EDGE_ROWS_PER_PARTITION,
        _MAX_LOOP_PARTITIONS,
        connected_components_min_label,
    )
    from tpg_weather_etl_spark.registry import all_queries
    from tpg_weather_etl_spark.session import get_spark

    spark = get_spark(app_name="stress_graph")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    sizes = [args.base_orders, args.base_orders * 4]
    queries = ["degree_distribution", "part_triangles", "pagerank_parts",
               "clustering_coeff"]
    timings: dict[str, dict[int, float]] = {
        q: {} for q in queries + ["connected_components"]}
    n_edges: dict[int, int] = {}
    loop_parts: dict[int, int] = {}
    pr_iters: dict[int, list[float]] = {}

    for n in sizes:
        out_dir = Path(f"/tmp/spark_graft_stress_graph_{n}")
        _write_graph(n, out_dir)
        print(f"== {n} orders ==")
        edges = QM._copurchase_edges(spark, str(out_dir))
        n_edges[n] = edges.count()
        # the loop sizing both CC and PageRank derive from the edge
        # count (PageRank symmetrizes, hence 2x)
        loop_parts[n] = max(1, min(
            _MAX_LOOP_PARTITIONS,
            -(-2 * n_edges[n] // _EDGE_ROWS_PER_PARTITION)))
        print(f"  edges={n_edges[n]}  loop_parts={loop_parts[n]}")
        for q in queries:
            t0 = time.perf_counter()
            qs[q](spark, str(out_dir)).write.format("noop").mode(
                "overwrite").save()
            dt = round(time.perf_counter() - t0, 2)
            timings[q][n] = dt
            print(f"  {q}: {dt}s")
            if q == "pagerank_parts":
                pr_iters[n] = list(QM.PAGERANK_ITER_TIMES)
                print(f"    iters: {pr_iters[n]}")
            release_all()
        t0 = time.perf_counter()
        labels = connected_components_min_label(
            QM._copurchase_edges(spark, str(out_dir)).select(
                F.col("u").alias("doc_a"), F.col("v").alias("doc_b")))
        labels.write.format("noop").mode("overwrite").save()
        timings["connected_components"][n] = round(
            time.perf_counter() - t0, 2)
        print(f"  connected_components: "
              f"{timings['connected_components'][n]}s")
        release_all()
        shutil.rmtree(out_dir, ignore_errors=True)

    ratios = {q: round(t[sizes[1]] / max(t[sizes[0]], 0.01), 2)
              for q, t in timings.items()}
    # per-iteration flatness within each run: last iteration must not
    # cost more than 2.5x the first (re-shuffling edge lists grows
    # per-iteration time; flat = the pre-partitioned layout is reused)
    iter_flat = {
        str(n): round(max(ts[-1], 0.01) / max(ts[0], 0.01), 2)
        for n, ts in pr_iters.items()
    }
    rec = {
        "sizes_orders": sizes,
        "n_edges": {str(k): v for k, v in n_edges.items()},
        "loop_parts": {str(k): v for k, v in loop_parts.items()},
        "edge_rows_per_partition": _EDGE_ROWS_PER_PARTITION,
        "timings_sec": {q: {str(k): v for k, v in t.items()}
                        for q, t in timings.items()},
        "ratio_4x_edges": ratios,
        "ratio_max": RATIO_MAX,
        "pagerank_iter_sec": {str(k): v for k, v in pr_iters.items()},
        "pagerank_iter_last_over_first": iter_flat,
    }
    (ROOT / "STRESS_graph.json").write_text(
        json.dumps(rec, indent=2) + "\n")
    print(json.dumps(ratios, indent=1))

    bad = []
    for q, r in ratios.items():
        # skip the ratio when the base run is too fast to measure —
        # JVM/GC noise at low single-digit seconds produces spurious
        # ratios (ADVICE r7 on stress_curation)
        if timings[q][sizes[0]] >= 2.0 and r > RATIO_MAX:
            bad.append(f"{q}: {r}x")
    if loop_parts[sizes[1]] <= loop_parts[sizes[0]]:
        bad.append(f"loop partition sizing did not grow with edges: "
                   f"{loop_parts}")
    for n, f in iter_flat.items():
        if f > 2.5 and max(pr_iters[int(n)][0], pr_iters[int(n)][-1]) > 2.0:
            bad.append(f"pagerank iterations grow within run at {n}: "
                       f"{pr_iters[int(n)]}")
    if bad:
        print("STRESS FAIL:", bad)
        return 1
    print("STRESS OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
