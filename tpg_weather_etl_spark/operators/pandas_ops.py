"""Arrow-vectorized Python operators — the sanctioned slow-path tier.

Three escalation levels, mirroring how a real pipeline should choose:

1. ``cosine_pandas_udf`` — scalar @pandas_udf: batch-vectorized numpy
   over Arrow columns. Exists as the fallback for math the built-in
   Column algebra cannot express; for plain cosine the JVM
   ``functions.vectors.cosine_similarity`` is the production path and
   the pytest proves both agree.
2. ``grouped_ols`` — applyInPandas (grouped map): per-group model fits
   (here OLS slope/intercept per key) where each group needs a dense
   local matrix; groups are shuffled to workers once, numpy does the
   algebra per group, output is a small model table.
3. ``doc_chunk_udtf`` — Spark 4 Python UDTF (table function): one
   input row expands to a variable number of typed output rows inside
   Arrow batches; registered via ``spark.udtf.register`` for SQL use.

All three move data through Arrow (never pickled rows), keep batch
sizes bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``, and
hold at scale because the Python work is per-partition/per-group with
no driver participation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
)


@F.pandas_udf(DoubleType())
def cosine_pandas_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized cosine similarity over two array<float/double>
    columns (Arrow list arrays → numpy per batch)."""
    def one(x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        nx = np.sqrt((x * x).sum())
        ny = np.sqrt((y * y).sum())
        if nx == 0.0 or ny == 0.0:
            return float("nan")
        return float((x * y).sum() / (nx * ny))
    return pd.Series([one(x, y) for x, y in zip(a, b)])


OLS_SCHEMA = StructType([
    StructField("group_key", StringType()),
    StructField("n", LongType()),
    StructField("slope", DoubleType()),
    StructField("intercept", DoubleType()),
])


def grouped_ols(df: DataFrame, key_col: str, x_col: str,
                y_col: str) -> DataFrame:
    """Per-group least-squares fit y ~ a·x + b via applyInPandas.

    The grouped-map pattern: one shuffle on the key, then each group's
    rows arrive as a single pandas DataFrame and numpy solves the
    normal equations locally. Output is one row per group — the model
    table stays tiny regardless of input size. Degenerate groups
    (n < 2 or zero x-variance) yield NaN slope.
    """

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[x_col].to_numpy(dtype=np.float64)
        y = pdf[y_col].to_numpy(dtype=np.float64)
        n = len(pdf)
        if n < 2 or np.ptp(x) == 0.0:
            slope, intercept = float("nan"), float("nan")
        else:
            slope, intercept = np.polyfit(x, y, 1)
        return pd.DataFrame({
            "group_key": [str(pdf[key_col].iloc[0])],
            "n": [n],
            "slope": [float(slope)],
            "intercept": [float(intercept)],
        })

    return df.groupBy(key_col).applyInPandas(fit, schema=OLS_SCHEMA)


def register_doc_chunk_udtf(spark, name: str = "doc_chunks",
                            chunk_tokens: int = 8):
    """Register a Python UDTF that splits a document into fixed-size
    token chunks — ``SELECT * FROM doc_chunks(doc_id, text)`` yields
    (doc_id, chunk_idx, chunk_text, n_tokens) rows.

    The UDTF form matters when the expansion logic is genuinely
    imperative; for this particular split the pure-Catalyst Generate
    pipeline in queries_text.q_chunk_dedup is the production path.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: long, chunk_idx: int, chunk_text: string,"
                     " n_tokens: int")
    class DocChunks:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            toks = text.split()
            for g in range(0, max(len(toks), 1), chunk_tokens):
                chunk = toks[g:g + chunk_tokens]
                yield (doc_id, g // chunk_tokens,
                       " ".join(chunk), len(chunk))

    spark.udtf.register(name, DocChunks)
    return DocChunks


def arrow_affine(df: DataFrame, col: str, scale: float, offset: float,
                 out_col: str = "affine") -> DataFrame:
    """Level 4 of the escalation: ``mapInArrow`` — whole RecordBatches
    transformed with pyarrow.compute, never converted to pandas (no
    index building, no object boxing). The right tier when the Python
    work is itself columnar (rescaling, casting, dictionary ops) and
    pandas semantics would only add overhead.

    Appends ``out_col`` = col·scale + offset as float64. Bit-identical
    to the JVM Column expression (both are IEEE multiply-add on the
    same doubles) — pinned by the pytest parity check.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())])
    idx = df.schema.names.index(col)
    s, o = float(scale), float(offset)

    def fn(batches):
        for b in batches:
            x = pc.cast(b.column(idx), pa.float64())
            y = pc.add(pc.multiply(x, pa.scalar(s)), pa.scalar(o))
            yield b.append_column(out_col, y)

    return df.mapInArrow(fn, out_schema)
