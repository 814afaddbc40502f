"""Distributed global prefix sum — running totals over a global order
WITHOUT a single-partition window.

``SUM() OVER (ORDER BY k)`` with no PARTITION BY forces every row
through one task — the plan works at any SF and silently serializes at
scale. The two-level form used by every shared-nothing engine:

1. range-partition on the order key (each partition owns a contiguous
   key range),
2. per-partition running sums (window partitioned by
   ``spark_partition_id()`` — parallel),
3. a P-row partition-totals table, prefix-summed on the driver-sized
   side and broadcast back as per-partition offsets.

The result is independent of where the range boundaries land, so the
sampling-based partitioner never affects values — only balance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
    bucket: Column | None = None,
) -> DataFrame:
    """Add ``out_col`` = inclusive running sum of ``value_col`` over
    the global ``order_cols`` order (ties must be broken by the order
    columns themselves — pass a unique key last).

    ``bucket`` (optional but preferred): an expression monotone
    non-decreasing in the order key with a bounded value set — e.g.
    ``shiftright(hash_key, 55)`` for a uniform 60-bit key. With it the
    local-cumsum window clusters by the bucket directly and the whole
    operator costs ONE data shuffle. Without it, rows are range-
    partitioned first and the window re-clusters by partition id —
    correct for arbitrary key types, but Catalyst cannot see that the
    range layout already satisfies the window, so the data moves
    twice.
    """
    if bucket is None:
        n = (num_partitions
             or df.sparkSession.sparkContext.defaultParallelism)
        staged = df.repartitionByRange(n, *order_cols).withColumn(
            "__b", F.spark_partition_id()
        )
    else:
        staged = df.withColumn("__b", bucket)
    w_in = (
        Window.partitionBy("__b")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # persisted: consumed by both the totals agg and the final join —
    # without materialization Spark computes the windowed subtree twice.
    # Tracked so a long-lived session can release it once the consumer
    # has materialized (ADVICE r2: the sweep otherwise accumulates
    # cached partitions for the session lifetime).
    from tpg_weather_etl_spark.caching import track
    local = track(staged.withColumn(
        "__cum_in", F.sum(value_col).over(w_in)
    ).persist())
    totals = local.groupBy("__b").agg(F.sum(value_col).alias("__ptot"))
    w_p = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "__poff", F.coalesce(F.sum("__ptot").over(w_p), F.lit(0))
    ).select("__b", "__poff")
    return (
        local.join(F.broadcast(offsets), "__b")
        .withColumn(out_col, F.col("__poff") + F.col("__cum_in"))
        .drop("__b", "__cum_in", "__poff")
    )


def global_running_max(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_max",
    num_partitions: int | None = None,
    inclusive: bool = True,
) -> DataFrame:
    """Add ``out_col`` = running MAX of ``value_col`` over the global
    ``order_cols`` order — same two-level shape as
    :func:`global_running_sum` (range-partition, per-partition window,
    P-row offsets broadcast back), so no row ever rides a
    single-partition window.

    ``inclusive=False`` gives the *exclusive* prefix (max over strictly
    preceding rows; NULL for the global first row) — the form skyline /
    Pareto-frontier pruning needs. Max is idempotent, so unlike the sum
    the per-partition combine is ``greatest`` of the local prefix and
    the prior partitions' total max (NULL-skipping, which is exactly
    the semantics an exclusive first row needs).
    """
    n = (num_partitions
         or df.sparkSession.sparkContext.defaultParallelism)
    staged = df.repartitionByRange(n, *order_cols).withColumn(
        "__b", F.spark_partition_id())
    end = 0 if inclusive else -1
    w_in = (
        Window.partitionBy("__b")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    from tpg_weather_etl_spark.caching import track
    local = track(staged.withColumn(
        "__cum_in", F.max(value_col).over(w_in)
    ).persist())
    totals = local.groupBy("__b").agg(F.max(value_col).alias("__ptot"))
    w_p = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "__poff", F.max("__ptot").over(w_p)
    ).select("__b", "__poff")
    return (
        local.join(F.broadcast(offsets), "__b")
        .withColumn(out_col, F.greatest("__poff", "__cum_in"))
        .drop("__b", "__cum_in", "__poff")
    )


def global_lead(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "lead_val",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = next row's ``value_col`` in the global
    ``order_cols`` order — LEAD(1) without the single-partition
    window, completing the distributed-window family (sum, max,
    lead).

    Two-level shape: range-partition, per-partition LEAD, then stitch
    partition boundaries — each non-empty partition's FIRST value
    (min of the order-struct) becomes the lead of the PREVIOUS
    non-empty partition's last row, via a lead over the P-row heads
    table broadcast back. Range partitions can be empty under heavy
    ties; ordering the heads by partition id and taking THEIR lead
    skips empties correctly. The global last row stays NULL.
    """
    n = (num_partitions
         or df.sparkSession.sparkContext.defaultParallelism)
    staged = df.repartitionByRange(n, *order_cols).withColumn(
        "__b", F.spark_partition_id())
    w_in = Window.partitionBy("__b").orderBy(*order_cols)
    from tpg_weather_etl_spark.caching import track
    local = track(staged.withColumn(
        "__ld", F.lead(value_col).over(w_in)
    ).persist())
    # struct fields aliased positionally: value_col may BE an order
    # column (lead over the key itself), which would duplicate names
    heads = local.groupBy("__b").agg(
        F.min(F.struct(
            *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order_cols)],
            F.col(value_col).alias("__v"))).alias("__h"))
    w_b = Window.orderBy("__b")
    nxt = heads.select(
        "__b",
        F.lead(F.col("__h").getField("__v")).over(w_b)
        .alias("__next_head"))
    return (
        local.join(F.broadcast(nxt), "__b", "left")
        .withColumn(out_col, F.coalesce("__ld", "__next_head"))
        .drop("__b", "__ld", "__next_head")
    )
