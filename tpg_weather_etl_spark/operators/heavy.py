"""Heavy hitters without shuffling the long tail.

A plain ``groupBy(word).count()`` shuffles every distinct value — at
100 TB the vocabulary long tail IS the corpus, and the shuffle is the
cost. The classical fix is two-phase Misra-Gries:

1. per-partition MG summaries: each task keeps at most ``k`` counters
   in bounded memory and emits its survivors — ≤ P×k rows leave the
   executors, independent of vocabulary size;
2. the weighted pigeonhole guarantees NO false negatives: a value with
   global count > N/k must exceed n_p/k in some partition p, and MG
   with k counters retains every value whose partition count exceeds
   n_p/(k+1) ⊇ n_p/k — so the survivor union is a superset of the
   true heavy hitters;
3. an exact recount restricted to the candidates (broadcast semi-join,
   map-side agg over ≤ P×k keys) removes the false positives.

The final answer is therefore EXACT (value-hash comparable against a
full GROUP BY oracle) while the plan never aggregates the tail.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CAND_SCHEMA = T.StructType([
    T.StructField("value", T.StringType(), False),
    T.StructField("lb", T.LongType(), False),   # MG lower-bound count
])


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries survivors (≤ k rows per partition).

    mapInPandas receives each partition as an iterator of Arrow
    batches, so the counter dict lives across batches of ONE partition
    and holds at most k entries — O(k) executor memory however large
    the partition. Decrement rounds are amortized O(1) per row (each
    round of k decrements retires k observations).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            # .tolist() once per Arrow batch: iterating the Series
            # itself re-boxes per element through pandas' indexing
            # machinery (~1.3x slower on a 2M-row probe; identical
            # values incl. None for nulls).
            for v in pdf[col].tolist():
                if v is None:
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            yield pd.DataFrame({
                "value": list(counters),
                "lb": list(counters.values()),
            })

    return df.select(F.col(col).alias(col)).mapInPandas(
        run, schema=_CAND_SCHEMA)


def heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """(value, cnt) for every value with global count·k > N — exact,
    via MG candidate pruning + candidate-only recount. One tiny
    shuffle (≤ P×k candidate rows) + one broadcast semi-join pass over
    the data; the long tail is never aggregated."""
    cand = mg_candidates(df, col, k).select("value").distinct()
    total = df.filter(F.col(col).isNotNull()).select(
        F.count(F.lit(1)).alias("__n"))
    exact = (
        df.join(F.broadcast(cand), df[col] == cand["value"], "left_semi")
        .groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.join(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("__n"))
        .select("value", "cnt")
    )
