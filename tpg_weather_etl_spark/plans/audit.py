"""Physical-plan audits (SURVEY §4: verify that Catalyst actually
delivers X1-X2 pushdown, X13 broadcasts, and minimal shuffles).

Used by tests and by the bench loop: after a query is correct,
``formatted_plan`` + these predicates check it is also the plan we
want at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (lower = better;
    broadcast exchanges are not counted)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\n\s*\(\d+\) Exchange", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from parquet scans (predicate pushdown X2)."""
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[(.*?)\]", plan)
