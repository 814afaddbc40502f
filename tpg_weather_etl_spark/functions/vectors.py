"""Vector expressions over ``array<float>`` embedding columns.

Pure Catalyst expressions (zip_with / aggregate) — no UDF, no
VectorUDT. The arithmetic is done in double precision regardless of
the storage type so results are reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision (left-to-right fold)."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision; NULL on zero-norm input."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom)


def dot_product_d(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ over arrays ALREADY in double — the per-pair core of
    ``cosine_similarity`` once the float→double cast has been hoisted
    into a per-row projection (float→double is exact, so hoisting the
    cast does not change a single bit of the product chain)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine_from_norms(a: Column, b: Column,
                      na: Column, nb: Column) -> Column:
    """``cosine_similarity(a, b)`` with ONLY the two l2 norms hoisted
    to per-row (join-side) projections; the arrays stay in their
    storage type and the float→double cast happens inside the single
    per-pair dot product.

    This is the MIXED hoist for key/bucket equi-joins whose sides
    cross an Exchange or Broadcast: a pre-cast double array doubles
    every shuffled/broadcast row (the dominant cost of a verify join
    at scale), while the norm is 8 bytes. Per pair it evaluates one
    fold (plus the exact, cheap casts) instead of the inline five.
    Bit-identical: ``dot_product`` casts exactly as
    ``cosine_similarity``'s own dot does, and ``na``/``nb`` must be
    ``l2_norm`` of the same columns."""
    denom = na * nb
    return F.when(denom > 0, dot_product(a, b) / denom)


def cosine_from_parts(a_d: Column, b_d: Column,
                      na: Column, nb: Column) -> Column:
    """``cosine_similarity(a, b)`` with the double casts and the two
    l2 norms computed once per ROW (join-side projections) instead of
    once per candidate PAIR (join condition / post-join projection).

    Inlined, the pair expression evaluates FIVE 64-element aggregates
    per candidate (dot(a,b) + two self-dots in the when-guard + two
    more in the division); with the parts hoisted it evaluates ONE.
    Bit-identical by construction: ``na``/``nb`` must be
    ``l2_norm(col)`` of the same column ``a_d``/``b_d`` were cast
    from, so every IEEE operation (self-dot, sqrt, the na*nb product,
    the division) has identical operands in identical order."""
    denom = na * nb
    return F.when(denom > 0, dot_product_d(a_d, b_d) / denom)
