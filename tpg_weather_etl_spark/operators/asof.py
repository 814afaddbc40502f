"""As-of join (reference J4, src/10_build_features.py:168-179, 253-264).

"For each left row, attach the nearest right row at-or-before the left
timestamp, within a tolerance window" — Spark has no native primitive.
Two implementations, picked by ``grid_minutes``:

1. **Grid candidate equi-join** (scale path, default when the right
   side sits on a fixed minute grid, as the reference's weather does —
   strict 10-min grid, hazard H4): explode each left row into the
   k = tolerance/grid candidate bin timestamps and equi-join on
   (keys, candidate_ts). This is a plain hash join — no range join, no
   giant window — and the fan-out is the small constant k+1. At 100 TB
   this is the plan you want; with a small right side it broadcasts.

2. **General range join + top-1** (fallback for an arbitrary right
   grid): non-equi time-range predicate on top of the key equi-join,
   then row_number desc = 1 per left row.

Caller contract: ``left`` carries a unique id column (event_id /
row_id / id / _row_id) so "per left row" is well-defined — mirrors the
reference's synthetic ``_row_id`` (10_build_features.py:197).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _left_id_col(left: DataFrame) -> str:
    for c in ("__asof_left_id", "event_id", "_row_id", "row_id", "id"):
        if c in left.columns:
            return c
    raise ValueError("asof_join needs a unique left id column "
                     "(event_id/_row_id/row_id/id)")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    on: Sequence[str] = (),
    tolerance_minutes: int = 5,
    grid_minutes: int | None = None,
    how: str = "left",
) -> DataFrame:
    """Nearest-past join: right.ts ≤ left.ts and left.ts − right.ts ≤ tol."""
    if grid_minutes:
        return _asof_grid(left, right, left_ts, right_ts, list(on),
                          tolerance_minutes, grid_minutes, how)
    return _asof_range(left, right, left_ts, right_ts, list(on),
                       tolerance_minutes, how)


def _payload_cols(right: DataFrame, right_ts: str, on: list[str]) -> list[str]:
    return [c for c in right.columns if c != right_ts and c not in on]


def _asof_grid(left, right, left_ts, right_ts, on, tol_min, grid_min, how):
    lid = _left_id_col(left)
    k = tol_min // grid_min
    lx = (
        left.withColumn("__asof_step", F.explode(F.sequence(F.lit(0), F.lit(k))))
        .withColumn(
            "__asof_cand_ts",
            F.timestamp_seconds(
                F.unix_timestamp(F.col(left_ts))
                - F.col("__asof_step").cast("long") * (grid_min * 60)
            ),
        )
    )
    # Rename every right column before the join: the right side may share
    # lineage with the left (self-derived grids), and renamed attributes
    # sidestep Spark's ambiguous-column resolution entirely.
    r = right.select(
        F.col(right_ts).alias("__asof_rts"),
        *[F.col(c).alias(f"__asof_k_{c}") for c in on],
        *[F.col(c) for c in _payload_cols(right, right_ts, on)],
    )
    cond = F.col("__asof_cand_ts") == F.col("__asof_rts")
    for c in on:
        cond = cond & (F.col(c) == F.col(f"__asof_k_{c}"))
    matched = lx.join(r, cond, "inner").drop(*[f"__asof_k_{c}" for c in on])
    w = Window.partitionBy(lid).orderBy(F.col("__asof_step").asc())
    best = (
        matched.withColumn("__asof_rn", F.row_number().over(w))
        .filter(F.col("__asof_rn") == 1)
        .withColumnRenamed("__asof_rts", right_ts)
        .drop("__asof_rn", "__asof_step", "__asof_cand_ts")
    )
    if how == "left":
        missing = left.join(best.select(lid), [lid], "left_anti")
        best = best.unionByName(missing, allowMissingColumns=True)
    return best


def _asof_range(left, right, left_ts, right_ts, on, tol_min, how):
    lid = _left_id_col(left)
    r = right.select(
        F.col(right_ts).alias("__asof_rts"),
        *[F.col(c).alias(f"__asof_k_{c}") for c in on],
        *[F.col(c) for c in _payload_cols(right, right_ts, on)],
    )
    cond = (F.col("__asof_rts") <= F.col(left_ts)) & (
        F.col("__asof_rts")
        >= F.col(left_ts) - F.expr(f"INTERVAL {tol_min} MINUTES")
    )
    for c in on:
        cond = cond & (F.col(c) == F.col(f"__asof_k_{c}"))
    matched = left.join(r, cond, "inner").drop(*[f"__asof_k_{c}" for c in on])
    w = Window.partitionBy(lid).orderBy(F.col("__asof_rts").desc())
    best = (
        matched.withColumn("__asof_rn", F.row_number().over(w))
        .filter(F.col("__asof_rn") == 1)
        .withColumnRenamed("__asof_rts", right_ts)
        .drop("__asof_rn")
    )
    if how == "left":
        missing = left.join(best.select(lid), [lid], "left_anti")
        best = best.unionByName(missing, allowMissingColumns=True)
    return best
