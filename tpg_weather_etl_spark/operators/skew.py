"""Skew-mitigation utilities for shuffles AQE cannot re-split.

AQE's skew-join handling (on in session.py) re-splits oversized
sort-merge partitions at runtime — use that first. These utilities
cover the cases it doesn't reach:

- ``salted_join``: a hot key on the probe side of a shuffle join where
  the build side can't broadcast (both sides large). Salting spreads
  one key's rows over N partitions at the cost of replicating the
  build side's matching rows N×. Also the pattern for stream-static
  joins, where AQE never sees the stream side's distribution.
- ``count_distinct_skew_safe``: COUNT(DISTINCT x) concentrates each
  group's full value set on one reducer; rewriting as distinct-then-
  count hashes (group, value) pairs, so a hot group spreads across the
  cluster in stage one and only its per-partition counts meet at the
  end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join robust to hot keys on ``left``.

    ``left`` rows get a random salt in [0, salt_buckets); ``right``
    rows are replicated once per salt value, so every (key, salt)
    bucket joins correctly. Result equals ``left.join(right, on, how)``
    for inner/left joins. Choose salt_buckets ≈ hot-key rows ÷ target
    partition rows; replication multiplies the right side, so keep it
    to the skewed-key subset at extreme scale (split-and-union).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    lsalted = left.withColumn(
        _SALT, (F.rand(seed) * salt_buckets).cast("int")
    )
    rsalted = right.withColumn(
        _SALT,
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    out = lsalted.join(rsalted, [*on, _SALT], how)
    return out.drop(_SALT)


def count_distinct_skew_safe(
    df: DataFrame, keys: list[str], value: str | Column
) -> DataFrame:
    """GROUP BY keys → COUNT(DISTINCT value), hot-group safe.

    Stage 1 dedupes on (keys, value) — partitioned by the composite
    hash, so a hot group's values spread evenly. Stage 2 counts the
    surviving rows per group (map-side combinable).
    """
    vcol = F.col(value) if isinstance(value, str) else value
    return (
        df.select(*keys, vcol.alias("__v"))
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )
