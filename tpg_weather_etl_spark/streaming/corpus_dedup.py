"""Incremental streaming corpus dedup — the streaming form of exact
content dedup (A1/fingerprint_dedup) for a continuously-arriving
document corpus.

A training-data pipeline re-crawls constantly; the batch dedup
operators (functions/text.py doc_fingerprint → groupBy) assume the
whole corpus is in hand. This module dedups INCREMENTALLY:

1. in-batch: keep the lowest doc_id per content fingerprint
   (priority-dedupe semantics, reference H2 tie rule);
2. cross-batch: left_anti join the batch's fingerprints against the
   fingerprints already in the OUTPUT table, so a document seen in
   any earlier micro-batch never re-enters the corpus.

The output table itself is the fingerprint store (column ``fp``) —
one source of truth, no second state table to drift. That also makes
the sink idempotent under foreachBatch replay: a re-run batch
anti-joins against output that already contains its rows and emits
nothing — the standard exactly-once contract for foreachBatch sinks.

100 TB shape: the anti-join shuffles the BATCH (small) against the
store's fingerprint column only (pruned scan — ReadSchema is
fp-only). At warehouse scale the store would be written bucketed on
``fp`` (sources/writers.py write_bucketed) so the anti-join
co-locates without shuffling the store; state never lives in
executor memory, unlike dropDuplicates-forever, whose state grows
without bound and dies with the checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tpg_weather_etl_spark.functions.text import doc_fingerprint

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("n_chars", T.LongType(), True),
])


def stream_documents(spark: SparkSession, input_dir: str,
                     max_files_per_trigger: int = 16) -> DataFrame:
    """readStream over a documents drop directory (json-lines files —
    the usual crawl-dump interchange format)."""
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(input_dir)
    )


def write_stream_dedup(docs: DataFrame, out_dir: str,
                       checkpoint_dir: str):
    """foreachBatch sink: append only never-seen-before documents
    (by content fingerprint) to ``out_dir``."""

    def _dedupe_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        from pyspark.sql import Window

        b = batch_df.withColumn("fp", doc_fingerprint(F.col("text")))
        # in-batch winner: lowest doc_id per fingerprint (H2 tie rule)
        w = Window.partitionBy("fp").orderBy("doc_id")
        b = (b.withColumn("__rk", F.row_number().over(w))
             .filter(F.col("__rk") == 1).drop("__rk"))
        try:
            seen = spark.read.parquet(out_dir).select("fp")
            b = b.join(seen, "fp", "left_anti")
        except Exception:
            pass  # first batch: no output table yet
        if not b.isEmpty():
            b.write.mode("append").parquet(out_dir)

    return (
        docs.writeStream.foreachBatch(_dedupe_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
    )
