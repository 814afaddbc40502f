"""Regenerate tests/plan_budgets.json — the per-query shuffle budget.

For every registry query, records the shuffle-exchange count of its
physical plan at sf0.001 (plan build only, nothing executes). The
paired test (tests/test_plan_budget.py) fails any query whose plan
grows MORE exchanges than budgeted — a new shuffle is the single most
expensive thing a code change can silently introduce at 100 TB, so
adding one must be a conscious, reviewed act (rerun this tool and
commit the diff).

Usage: python tools/update_plan_budgets.py [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BUDGET_PATH = Path(__file__).resolve().parent.parent / "tests" / "plan_budgets.json"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from tpg_weather_etl_spark.plans.audit import count_exchanges
    from tpg_weather_etl_spark.registry import all_queries
    from tpg_weather_etl_spark.session import get_spark

    spark = get_spark(app_name="plan-budget")
    spark.sparkContext.setLogLevel("ERROR")

    old = {}
    if BUDGET_PATH.exists():
        old = json.loads(BUDGET_PATH.read_text())

    from tpg_weather_etl_spark.caching import release_all

    budgets: dict[str, int] = {}
    for name, fn in sorted(all_queries().items()):
        # cache-free baseline per query: a persist created while an
        # earlier query was CONSTRUCTED (e.g. the shared shingle
        # table) would otherwise substitute InMemoryRelations into
        # later plans and make budgets registry-order-dependent
        release_all()
        spark.catalog.clearCache()
        df = fn(spark, args.sf)
        n = count_exchanges(df)
        budgets[name] = n
        delta = ""
        if name in old and old[name] != n:
            delta = f"  (was {old[name]})"
        print(f"{name:32s} exchanges={n}{delta}")

    BUDGET_PATH.write_text(json.dumps(budgets, indent=1, sort_keys=True) + "\n")
    print(f"\nwrote {BUDGET_PATH} ({len(budgets)} queries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
