"""Binned interval join — point-in-interval joins without a
BroadcastNestedLoopJoin.

Spark plans a plain ``points JOIN intervals ON ts BETWEEN start AND
end`` as a nested-loop join (broadcast if one side is small, else
cartesian) — quadratic and undistributable at scale. The standard
scale-out form buckets time into fixed bins: each interval is exploded
to the bins it covers, each point maps to exactly ONE bin, and the
join becomes a hash equi-join on the bin key with a residual range
predicate. Each matching (point, interval) pair appears exactly once —
in the point's bin — so no post-join dedupe is needed.

Bin width tuning: bins ≈ typical interval length keep the per-interval
explosion factor at ~2 rows while keeping bin populations small. Cost
is O(points + intervals × (len/bin + 1)) shuffled rows, all hashed —
no nested loop anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tpg_weather_etl_spark.functions.time import epoch_us

_US = 1_000_000


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row whose half-open
    window ``[start, end)`` contains ``point_ts``.

    Returns points columns + intervals columns. ``how`` may be
    ``inner`` (matching pairs only) or ``left`` (keep unmatched
    points with NULL interval columns — implemented as the inner form
    unioned with the anti side, both hash joins).
    """
    bin_us = int(bin_seconds) * _US

    def ts_bin(c: Column) -> Column:
        return F.floor(epoch_us(c) / bin_us).cast("long")

    start_bin = ts_bin(F.col(start_col))
    # end is exclusive: a window ending exactly on a bin boundary does
    # not cover that bin
    end_bin = (
        F.floor((epoch_us(F.col(end_col)) - 1) / bin_us).cast("long")
    )
    iv_binned = intervals.withColumn(
        "__bin",
        F.explode(
            # malformed intervals (end <= start) cover no bins; without
            # the guard F.sequence would generate a DESCENDING bin list
            # — an unbounded blowup hazard on untrusted data
            F.when(end_bin >= start_bin, F.sequence(start_bin, end_bin))
            .otherwise(F.array().cast("array<long>"))
        ),
    )
    pt_binned = points.withColumn("__bin", ts_bin(F.col(point_ts)))
    # alias both sides: points and intervals often share lineage (e.g.
    # intervals derived from the same table), and unqualified refs in a
    # self-join resolve ambiguously
    p, i = pt_binned.alias("__pts"), iv_binned.alias("__ivs")
    cond = (
        (F.col("__pts.__bin") == F.col("__ivs.__bin"))
        & (F.col(f"__pts.{point_ts}") >= F.col(f"__ivs.{start_col}"))
        & (F.col(f"__pts.{point_ts}") < F.col(f"__ivs.{end_col}"))
    )
    inner = p.join(i, cond, "inner").select(
        *[F.col(f"__pts.{c}") for c in points.columns],
        *[F.col(f"__ivs.{c}") for c in intervals.columns],
    )
    if how == "inner":
        return inner
    if how == "left":
        matched_keys = inner.select(*points.columns)
        unmatched = points.exceptAll(matched_keys)
        for c in intervals.columns:
            unmatched = unmatched.withColumn(c, F.lit(None))
        return inner.unionByName(unmatched)
    raise ValueError(f"unsupported how={how!r}")
