"""Exact discrete quantiles over groups (hazard H3).

DuckDB's ``QUANTILE``/``quantile_disc`` (used by the reference's
feature aggregation for p90, src/11_build_features_by_stop_line.py:115)
is a *discrete* quantile: it returns the element of the sorted non-null
group at 1-based index ``ceil(p * n)`` (empirically verified against
DuckDB 1.0: n=17,p=0.9 → 16th element; n=10,p=0.9 → 9th). Spark's
``percentile``/``median`` are continuous (interpolating), so for exact
parity we implement the discrete pick with a window sort — which also
scales: one sort-shuffle on the group key, no collect_list blowup for
large groups, and the subsequent groupBy reuses the hash partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__dq_rn"
_CNT = "__dq_cnt"


def discrete_quantile_expr(p: float, value_col: str) -> Column:
    """Aggregate expression picking the discrete-quantile element.

    Must be used on a DataFrame prepared by ``with_group_quantiles``'s
    internal window (columns __dq_rn / __dq_cnt present).
    """
    idx = F.greatest(F.ceil(F.col(_CNT) * F.lit(p)), F.lit(1))
    return F.max(F.when(F.col(_RN) == idx, F.col(value_col)))


def with_group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: dict[str, float],
    extra_aggs: list[Column] | None = None,
) -> DataFrame:
    """groupBy(group_cols) with exact discrete quantiles of value_col.

    Single logical sort-shuffle: a window ranks non-null values within
    each group; the groupBy that follows hashes on the same keys, so
    AQE/exchange-reuse avoids a second full shuffle. NULL values sort
    last and are excluded from the count, matching DuckDB's
    NULL-ignoring aggregate semantics.
    """
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(value_col).asc_nulls_last()
    )
    ranked = df.withColumn(_RN, F.row_number().over(w)).withColumn(
        _CNT,
        F.count(value_col).over(Window.partitionBy(*group_cols)),
    )
    aggs = [
        discrete_quantile_expr(p, value_col).alias(name)
        for name, p in quantiles.items()
    ]
    if extra_aggs:
        aggs = list(extra_aggs) + aggs
    return ranked.groupBy(*group_cols).agg(*aggs)
