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
fp-only). With ``store_table`` set, the store is kept hash-bucketed
on ``fp`` (sources/writers.py write_bucketed) so the anti-join
co-locates WITHOUT shuffling the store (plan-proofed in
tests/test_streaming_dedup.py); state never lives in executor
memory, unlike dropDuplicates-forever, whose state grows without
bound and dies with the checkpoint.
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


def _path_exists(spark: SparkSession, path: str) -> bool:
    """Hadoop-FS existence check for the output store. Absence is the
    ONLY condition that may skip the cross-batch anti-join; any other
    read failure (corrupt footer, permissions, transient FS error)
    must propagate, not silently admit duplicates."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def _touch_marker(spark: SparkSession, path: str) -> None:
    """Create an empty marker directory on the store's filesystem —
    the durable one-way latch the auto-cap streams use to remember
    "a flood has been seen" across sink invocations AND stream
    restarts (the latch must outlive the foreachBatch closure: a
    restarted stream replays no history it could re-detect from)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.mkdirs(p)


def batch_new_documents(batch_df: DataFrame,
                        seen: DataFrame | None) -> DataFrame:
    """One micro-batch of incremental dedup: fingerprint, keep the
    lowest doc_id per fingerprint in-batch (H2 tie rule), then
    anti-join against the fingerprints already in the store (``seen``
    is None only for a store that does not exist yet).

    Module-level (not a closure) so tests can assert the exact plan
    the stream executes — e.g. that a bucketed store side joins
    without an Exchange."""
    from pyspark.sql import Window

    b = batch_df.withColumn("fp", doc_fingerprint(F.col("text")))
    w = Window.partitionBy("fp").orderBy("doc_id")
    b = (b.withColumn("__rk", F.row_number().over(w))
         .filter(F.col("__rk") == 1).drop("__rk"))
    if seen is not None:
        b = b.join(seen, "fp", "left_anti")
    return b


def write_stream_dedup(docs: DataFrame, out_dir: str,
                       checkpoint_dir: str,
                       store_table: str | None = None,
                       num_buckets: int = 32):
    """foreachBatch sink: append only never-seen-before documents
    (by content fingerprint).

    Default store is plain parquet at ``out_dir``. Pass
    ``store_table`` to keep the store as a managed table hash-
    bucketed on ``fp`` instead (sources/writers.py write_bucketed):
    the per-batch anti-join then reads the store side already
    partitioned on the join key — NO Exchange on the corpus side,
    only the (small) batch shuffles. At 100 TB that is the difference
    between shuffling the whole corpus once per micro-batch and
    shuffling just the new arrivals (plan-proofed in
    tests/test_streaming_dedup.py). Size ``num_buckets`` >= the
    expected per-batch shuffle parallelism: if the batch side arrives
    hash-partitioned wider than the bucket count, Spark reshuffles
    the bucketed store UP to match instead."""

    def _dedupe_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if store_table is not None:
            if not spark.catalog.tableExists(store_table):
                # A fresh session's in-memory catalog has forgotten
                # every store a previous run wrote; the data under the
                # managed location has not. Re-register it (same
                # bucket spec) so replay stays idempotent AND the
                # append below can't die with LOCATION_ALREADY_EXISTS.
                from tpg_weather_etl_spark.sources.writers import (
                    repair_orphaned_table)
                repair_orphaned_table(spark, store_table,
                                      bucket_cols=["fp"],
                                      num_buckets=num_buckets,
                                      sort_cols=["fp"])
            seen = (spark.table(store_table).select("fp")
                    if spark.catalog.tableExists(store_table) else None)
        else:
            seen = (spark.read.parquet(out_dir).select("fp")
                    if _path_exists(spark, out_dir) else None)
        b = batch_new_documents(batch_df, seen)
        if b.isEmpty():
            return
        if store_table is not None:
            from tpg_weather_etl_spark.sources.writers import write_bucketed
            write_bucketed(b, store_table, ["fp"],
                           num_buckets=num_buckets, sort_cols=["fp"],
                           mode="append")
        else:
            b.write.mode("append").parquet(out_dir)

    return (
        docs.writeStream.foreachBatch(_dedupe_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
    )
