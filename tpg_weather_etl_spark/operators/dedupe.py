"""Deduplication operators.

- exact_dedupe:        reference A1 (drop_duplicates, 01_ingest_gtfs.py:160 etc.)
- priority_dedupe:     reference A2 (top-1 per business key under a
                       multi-column priority order, 02_ingest_istdaten.py:271-325)
- group_median_dedupe: reference A3 (weather key collisions resolved by
                       per-measure median, 03_ingest_weather.py:172-217)

Scale notes: each is a single hash/sort shuffle on the dedupe key.
priority_dedupe uses row_number over a window — Spark's sort-based
window exec does partial sorting map-side; for skewed keys AQE skew
handling applies because the shuffle is a plain hash partition on the
key. Hazard H2: pandas resolves priority ties by stable input order;
Spark requires a total order, so callers must supply tiebreak columns
that make the order deterministic (we raise if none given).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_dedupe(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Exact duplicate elimination (all columns or a subset)."""
    return df.dropDuplicates(list(subset)) if subset else df.dropDuplicates()


def priority_dedupe(
    df: DataFrame,
    key_cols: Sequence[str | Column],
    priority: Sequence[Column],
    tiebreak: Sequence[str | Column],
) -> DataFrame:
    """Keep the single best row per key under a priority ordering.

    ``priority`` are ordering columns best-first (e.g.
    [status_rank.desc(), has_estimate.desc(), est_ts.desc()]);
    ``tiebreak`` must make the total order deterministic (hazard H2).
    """
    if not tiebreak:
        raise ValueError("priority_dedupe requires explicit tiebreak columns (H2)")
    order = list(priority) + [
        c if isinstance(c, Column) else F.col(c) for c in tiebreak
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__pd_rn", F.row_number().over(w))
        .filter(F.col("__pd_rn") == 1)
        .drop("__pd_rn")
    )


def group_median_dedupe(
    df: DataFrame,
    key_cols: Sequence[str],
    measure_cols: Sequence[str],
) -> DataFrame:
    """Collapse key collisions by taking the per-measure median.

    Matches pandas ``groupby(key).median(numeric_only=True)``
    (interpolating median; Spark's F.median is the same exact
    interpolating semantics as of 3.4+).
    """
    aggs = [F.median(c).alias(c) for c in measure_cols]
    return df.groupBy(*key_cols).agg(*aggs)
