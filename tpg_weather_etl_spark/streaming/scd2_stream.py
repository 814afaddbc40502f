"""Streaming SCD2 dimension maintenance (CDC apply) via foreachBatch.

The change stream carries ``(key, attr, changed_at)``; the maintained
table at ``out_dir`` holds ``(key, attr, valid_from, valid_to)`` with
``valid_to`` NULL on each key's current row. Per micro-batch:

1. dedupe the batch exactly (idempotent under foreachBatch's
   at-least-once replay) and resolve same-instant conflicts
   deterministically (min attr wins — a tie rule, stated, not an
   accident of arrival order);
2. restrict to AFFECTED keys via semi-join — only their history is
   rewritten, untouched keys never move;
3. union the affected keys' existing rows (each ``valid_from`` is a
   change point) with the new changes and collapse consecutive
   same-attr runs — the gaps-and-islands math shared with the batch
   ``scd2_intervals`` gate — then re-derive the interval chain with
   ``lead``;
4. rewrite = untouched rows (broadcast anti-join on the touched key
   set) ∪ rebuilt history — the key-scoped overwrite shape of
   ``upsert_station_range`` (K6). The union is localCheckpoint-ed
   before the overwrite so the write never reads the files it is
   replacing.

At 100 TB: the touched-key semi/anti joins are the whole trick — a
micro-batch touches a tiny key set, so the rewrite is bounded by the
batch, not the dimension; with the table bucketed on key both joins
co-locate (same plan proof as the bucketed corpus-dedup store).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SCD2_SCHEMA = ("key string, attr string, valid_from timestamp, "
               "valid_to timestamp")


def _table_exists(spark: SparkSession, path: str) -> bool:
    # explicit absence check (ADVICE r4: never treat arbitrary read
    # failures as "first batch")
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)


def apply_scd2_batch(spark: SparkSession, batch_df: DataFrame,
                     out_dir: str) -> None:
    """Apply one batch of changes (key, attr, changed_at) to the SCD2
    table at ``out_dir``. Deterministic and idempotent: replaying a
    batch leaves the table unchanged."""
    changes = batch_df.select("key", "attr", "changed_at").distinct()
    if changes.isEmpty():
        # a replayed/empty trigger must not rewrite the whole table
        return
    w_tie = Window.partitionBy("key", "changed_at").orderBy("attr")
    changes = (changes.withColumn("rn", F.row_number().over(w_tie))
               .filter(F.col("rn") == 1).drop("rn"))

    if _table_exists(spark, out_dir):
        existing = spark.read.schema(SCD2_SCHEMA).parquet(out_dir)
    else:
        existing = spark.createDataFrame([], SCD2_SCHEMA)

    touched = changes.select("key").distinct()
    old_points = (
        existing.join(F.broadcast(touched), "key", "left_semi")
        .select("key", "attr", F.col("valid_from").alias("changed_at")))
    points = old_points.unionByName(
        changes.select("key", "attr", "changed_at")).distinct()
    # same-instant conflicts across old/new resolved by the same rule
    points = (points.withColumn("rn", F.row_number().over(w_tie))
              .filter(F.col("rn") == 1).drop("rn"))

    # collapse consecutive same-attr runs (gaps-and-islands), then
    # close each island at the next island's start
    w_all = Window.partitionBy("key").orderBy("changed_at")
    w_val = Window.partitionBy("key", "attr").orderBy("changed_at")
    runs = points.select(
        "key", "attr", "changed_at",
        (F.row_number().over(w_all)
         - F.row_number().over(w_val)).alias("grp"))
    islands = runs.groupBy("key", "attr", "grp").agg(
        F.min("changed_at").alias("valid_from"))
    w_seq = Window.partitionBy("key").orderBy("valid_from")
    rebuilt = islands.select(
        "key", "attr", "valid_from",
        F.lead("valid_from").over(w_seq).alias("valid_to"))

    untouched = existing.join(F.broadcast(touched), "key", "left_anti")
    final = untouched.unionByName(rebuilt).localCheckpoint(eager=True)
    final.write.mode("overwrite").parquet(out_dir)


def stream_scd2(changes: DataFrame, out_dir: str,
                checkpoint_dir: str):
    """writeStream wrapper: maintain the SCD2 table from a change
    stream. foreachBatch + the idempotent apply give exactly-once
    table state under replay."""
    def _do(batch_df: DataFrame, batch_id: int) -> None:
        apply_scd2_batch(batch_df.sparkSession, batch_df, out_dir)

    return (changes.writeStream
            .foreachBatch(_do)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
