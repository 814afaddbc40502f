"""Print the formatted physical plan of any registry query.

Usage: python tools/explain_query.py [--sf DIR] name [name...]
Handy for reviewing pushdown (PushedFilters/ReadSchema), join
strategies, and Exchange counts without writing a script.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from tpg_weather_etl_spark.registry import all_queries
    from tpg_weather_etl_spark.session import get_spark

    spark = get_spark(app_name="explain")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for name in args.names:
        if name not in qs:
            print(f"unknown query: {name}")
            return 1
        print(f"=== {name} ===")
        qs[name](spark, args.sf).explain("formatted")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
