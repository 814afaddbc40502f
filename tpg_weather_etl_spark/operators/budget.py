"""Greedy budget fill: admit rows per group, in a given preference
order, while a running total stays within a budget.

The curation primitive behind "fill each source's token quota"
(queries_text.q_token_budget_sample) and any cost-capped selection
(storage quotas, labeling budgets, per-tenant rate plans).

Scale shape: ONE shuffle on the group columns, shared by the ordering
window and the running sum (identical partitioning, one Window spec);
the budget predicate is map-side after the window. A pathological
mega-group bounds the window partition — the budget itself caps useful
depth, so pre-filter rows that cannot be admitted (amount > budget)
or chunk the order key when a group outgrows an executor.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def greedy_budget_fill(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column | str],
    amount_col: str,
    budget: float,
    cum_col: str = "cum_amount",
) -> DataFrame:
    """Keep each group's maximal prefix (in ``order_cols`` order) whose
    running ``amount_col`` total is <= ``budget``. Adds ``cum_col``
    with the running total including the current row.

    The ordering must be total (include a unique tiebreak column) or
    the admitted set is nondeterministic across runs.
    """
    w = (Window.partitionBy(*group_cols)
         .orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        df.withColumn(cum_col, F.sum(amount_col).over(w))
        .filter(F.col(cum_col) <= budget)
    )
