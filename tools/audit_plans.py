"""Plan audit across gate queries: shuffle-exchange count, broadcast
usage, parquet pushdown. Run after correctness — iterate until each
plan is the one you'd want at 100 TB.

Usage: python tools/audit_plans.py [--sf DIR] [names...]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--show", action="store_true",
                    help="print full formatted plan")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from tpg_weather_etl_spark.plans.audit import (
        count_exchanges,
        formatted_plan,
        has_broadcast_join,
        pushed_filters,
    )
    from tpg_weather_etl_spark.registry import all_queries
    from tpg_weather_etl_spark.session import get_spark

    spark = get_spark(app_name="audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for name in args.names or sorted(qs):
        try:
            df = qs[name](spark, args.sf)
            nx = count_exchanges(df)
            bc = "bcast" if has_broadcast_join(df) else "     "
            pf = pushed_filters(df)
            npf = sum(1 for p in pf if p.strip())
            print(f"{name:26s} exchanges={nx:2d} {bc} pushedFilterScans={npf}")
            if args.show:
                print(formatted_plan(df))
        except Exception as exc:
            print(f"{name:26s} ERROR {type(exc).__name__}: {exc}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
