"""Deterministic, engine-portable sampling (reference O3).

The reference uses pandas ``df.sample(n=100, random_state=42)``
(app/streamlit_app.py:100-109). Seeded RNG streams are not portable
across engines, so for oracle-comparable sampling we use an explicit
integer LCG over a key column — deterministic, partition-parallel (a
pure filter — no shuffle, pushes down past projections), and identical
in any SQL dialect.

For statistical (non-reproducible-across-engines) sampling, use
``df.sample(fraction, seed)`` directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2147483648  # 2^31


def lcg_bucket(key: Column, buckets: int = 100) -> Column:
    """((a*key + c) mod 2^31) mod buckets — portable pseudo-random bucket."""
    return ((key.cast("long") * LCG_A + LCG_C) % LCG_M) % buckets


def deterministic_sample(df: DataFrame, key: str, percent: int) -> DataFrame:
    """Keep ~percent% of rows, chosen by LCG bucket of an integer key."""
    return df.filter(lcg_bucket(F.col(key)) < percent)


def deterministic_sample_sql(key: str, percent: int) -> str:
    """The oracle-side SQL predicate equivalent of deterministic_sample."""
    return f"((({key} * {LCG_A} + {LCG_C}) % {LCG_M}) % 100) < {percent}"
