"""As-of join (reference J4, src/10_build_features.py:168-179, 253-264).

"For each left row, attach the nearest right row at-or-before the left
timestamp, within a tolerance window" — Spark has no native primitive.
Two implementations, picked by ``grid_minutes``:

1. **Grid candidate equi-join** (scale path, when the right side sits
   on a fixed minute grid, as the reference's weather does — strict
   10-min grid, hazard H4): explode each left row into the
   k = tolerance/grid candidate bin timestamps, LEFT equi-join on
   (keys, candidate_ts), then ONE ``min_by`` aggregation per left row
   picks the nearest matched step. ``min_by`` ignores NULL ordering
   keys, so unmatched candidates drop out and fully-unmatched rows
   keep NULL payload — left semantics with no anti-join, no union, no
   window, and a single scan of each input (the previous window +
   anti-join + union form scanned the left side 10×).

2. **General range join + max_by** (fallback for an arbitrary right
   grid): non-equi time-range predicate on the key equi-join, then
   ``max_by(payload, right_ts)`` per left row — latest obs in range.

Caller contract: ``left`` carries a unique id column (event_id /
row_id / id / _row_id) — mirrors the reference's synthetic ``_row_id``
(10_build_features.py:197) — and the right side is unique per
(keys, ts) (true for observation grids; duplicate right keys would
make "the" nearest row ambiguous in any formulation).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tpg_weather_etl_spark.functions.time import epoch_us


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


def _renamed_right(right: DataFrame, right_ts: str, on: list[str]) -> DataFrame:
    # Rename every right column before the join — keys, ts, AND
    # payload: the right side may share lineage with the left
    # (self-derived grids) or share payload column names with it, and
    # renamed attributes sidestep ambiguous resolution / wrong-side
    # picks entirely. Payload names are restored in the final select.
    return right.select(
        F.col(right_ts).alias("__asof_rts"),
        *[F.col(c).alias(f"__asof_k_{c}") for c in on],
        *[F.col(c).alias(f"__asof_p_{c}")
          for c in _payload_cols(right, right_ts, on)],
    )


def _pick_best(joined: DataFrame, left: DataFrame, lid: str,
               right_ts: str, payload: list[str], order_key: Column,
               how: str) -> DataFrame:
    left_cols = [c for c in left.columns if c != lid]
    clash = [c for c in payload + [right_ts] if c in left.columns]
    if clash:
        raise ValueError(
            f"asof_join output name collision with left columns: {clash}; "
            "rename them on one side before joining"
        )
    best_struct = F.min_by(
        F.struct(F.col("__asof_rts").alias(right_ts),
                 *[F.col(f"__asof_p_{c}").alias(c) for c in payload]),
        order_key,
    ).alias("__asof_best")
    agg = joined.groupBy(lid).agg(
        *[F.first(c).alias(c) for c in left_cols],  # constant per lid
        best_struct,
    )
    out = agg.select(
        lid, *left_cols,
        F.col(f"__asof_best.{right_ts}").alias(right_ts),
        *[F.col(f"__asof_best.{c}").alias(c) for c in payload],
    )
    if how == "inner":
        out = out.filter(F.col(right_ts).isNotNull())
    return out


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
    r = _renamed_right(right, right_ts, on)
    cond = F.col("__asof_cand_ts") == F.col("__asof_rts")
    for c in on:
        cond = cond & (F.col(c) == F.col(f"__asof_k_{c}"))
    joined = lx.join(r, cond, "left").drop(
        *[f"__asof_k_{c}" for c in on], "__asof_cand_ts"
    )
    # nearest past = smallest matched step; NULL steps (no match) are
    # ignored by min_by
    order_key = F.when(F.col("__asof_rts").isNotNull(), F.col("__asof_step"))
    return _pick_best(joined, left, lid, right_ts,
                      _payload_cols(right, right_ts, on), order_key, how)


def _asof_range(left, right, left_ts, right_ts, on, tol_min, how):
    lid = _left_id_col(left)
    r = _renamed_right(right, right_ts, on)
    cond = (F.col("__asof_rts") <= left[left_ts]) & (
        F.col("__asof_rts")
        >= left[left_ts] - F.expr(f"INTERVAL {tol_min} MINUTES")
    )
    for c in on:
        cond = cond & (left[c] == F.col(f"__asof_k_{c}"))
    joined = left.join(r, cond, "left").drop(
        *[f"__asof_k_{c}" for c in on]
    )
    # latest in-range obs = max right_ts; min_by on negated epoch keeps
    # one code path (min_by ignores NULLs; max_by would too, but the
    # shared helper takes a single ordering key)
    order_key = F.when(
        F.col("__asof_rts").isNotNull(),
        -epoch_us(F.col("__asof_rts")),
    )
    return _pick_best(joined, left, lid, right_ts,
                      _payload_cols(right, right_ts, on), order_key, how)
