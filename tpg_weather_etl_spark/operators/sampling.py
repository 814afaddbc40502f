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
    """floor(((a*key + c) mod 2^31) * buckets / 2^31) — portable
    pseudo-random bucket from the LCG state's HIGH bits.

    High bits, not ``state % buckets``: with a power-of-two modulus
    the LCG's low bits are weak — state parity equals key parity (a
    odd, c odd), and an even modulo preserves it, so ``% 100`` on an
    all-even key column reached only the 50 odd buckets and
    ``percent=1`` (bucket 0) selected NOTHING (caught by
    test_hash_health's strided-key spread pin, round 9). The high-bit
    quotient is parity-free and exact in both engines: state*buckets
    < 2^38 is exactly representable, and division by 2^31 is a power-
    of-two scaling, so floor() agrees bit-for-bit with integer
    division."""
    state = (key.cast("long") * LCG_A + LCG_C) % LCG_M
    return F.floor((state * buckets) / F.lit(LCG_M)).cast("long")


def deterministic_sample(df: DataFrame, key: str, percent: int) -> DataFrame:
    """Keep ~percent% of rows, chosen by LCG bucket of an integer key."""
    return df.filter(lcg_bucket(F.col(key)) < percent)


def deterministic_sample_sql(key: str, percent: int) -> str:
    """The oracle-side SQL predicate equivalent of deterministic_sample."""
    return (f"CAST(floor(((({key} * {LCG_A} + {LCG_C}) % {LCG_M}) * 100)"
            f" / {LCG_M}) AS BIGINT) < {percent}")


def deterministic_sample_capped(df: DataFrame, key: str, percent: int,
                                max_rows: int) -> DataFrame:
    """``deterministic_sample`` with a FIXED row cap: keep the
    ``max_rows`` sampled rows with the smallest LCG value (ties broken
    by the key). A percentage knob alone scales WITH the corpus —
    pct²·n² still grows quadratically at 100× data — so any evaluator
    built on a sample must bound the absolute count, not the fraction.

    Plan: the pct filter is a pushed-down scan predicate; the cap is
    ``orderBy(...).limit(n)`` → TakeOrderedAndProject (distributed
    partial top-N, no global sort), so the operator stays scale-safe.
    """
    full = (F.col(key).cast("long") * LCG_A + LCG_C) % LCG_M
    return (df.filter(lcg_bucket(F.col(key)) < percent)
            .orderBy(full.asc(), F.col(key).asc()).limit(max_rows))


def deterministic_sample_capped_sql(key: str, percent: int,
                                    max_rows: int,
                                    table: str = "documents") -> str:
    """Oracle-side subquery equivalent of deterministic_sample_capped
    (a FROM-able `(SELECT * ... LIMIT n)` string)."""
    lcg = f"(({key} * {LCG_A} + {LCG_C}) % {LCG_M})"
    bucket = f"CAST(floor(({lcg} * 100) / {LCG_M}) AS BIGINT)"
    return (f"(SELECT * FROM {table} WHERE {bucket} < {percent} "
            f"ORDER BY {lcg}, {key} LIMIT {max_rows})")
