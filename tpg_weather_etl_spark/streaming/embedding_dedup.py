"""Incremental streaming EMBEDDING near-dup dedup — the semantic
companion to ``streaming/neardup_stream.py`` (token-level near-dups)
and ``streaming/corpus_dedup.py`` (exact content): a continuously-
arriving (vec_id, embedding) stream where each micro-batch admits
only vectors that are not semantically near-duplicate (cosine ≥ τ)
of anything already admitted, nor of an earlier vector in the same
batch. This is SemDeDup's admission decision made incrementally —
a re-crawl pipeline embeds documents as they arrive and cannot
re-cluster the corpus per batch.

Per batch:

1. replay gate — anti-join the batch's vec_ids against the output
   store (idempotent foreachBatch contract: a re-run batch is fully
   absorbed here and emits nothing);
2. in-batch near-dups — multi-table hyperplane-LSH buckets within
   the batch (the SAME family as the batch gates, via
   ``buckets_for_embeddings``), same-(tbl, bucket) candidates, exact
   cosine ≥ τ verify, connected components, keep the min-vec_id
   member per group (H2 tie rule);
3. cross-corpus near-dups — the batch's buckets probe the BUCKET
   STORE (n_tables rows per stored vector, appended as vectors are
   admitted). Candidate store vectors are re-read ON DEMAND: a
   semi-join on the candidate ids prunes the store scan to the
   handful of matched vectors, so the corpus embeddings are never
   rescanned wholesale;
4. survivors append to the output store; their buckets append to the
   bucket store — ``cap_new_buckets`` enforces the dense-bucket cap
   as an APPEND INVARIANT when ``bucket_cap`` is set (SCALE.md rule
   11's streaming flavor: a dense semantic region — near-identical
   template embeddings — arrives unannounced, and each admitted
   member would otherwise grow its bucket linearly with the corpus,
   turning every future batch's probe join quadratic).

100 TB shape: the only store-sized joins key on (tbl, bucket)
(bucket probe) and vec_id (replay gate + candidate semi-join) — both
prunable/bucketable — and per-batch work scales with the batch plus
its candidates, not the corpus. State lives in tables, never in
executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tpg_weather_etl_spark.queries_embeddings import (
    NEARDUP_TAU,
    buckets_for_embeddings,
    filter_hot_buckets,
)
from tpg_weather_etl_spark.streaming.corpus_dedup import (
    _path_exists,
    _touch_marker,
)

EMB_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType(), True),
    T.StructField("embedding", T.ArrayType(T.FloatType()), True),
])


def stream_embeddings(spark: SparkSession, input_dir: str,
                      max_files_per_trigger: int = 16) -> DataFrame:
    """readStream over an embeddings drop directory (json-lines, the
    embedding column a float array — the usual encoder-output
    interchange shape)."""
    return (
        spark.readStream.schema(EMB_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(input_dir)
    )


def cap_new_buckets(new_bkt: DataFrame, store_bkt: DataFrame | None,
                    cap: int) -> DataFrame:
    """Append-time enforcement of the dense-bucket cap: a
    (tbl, bucket) group never grows past ``cap`` members, so every
    FUTURE batch's probe join against the store is bounded at
    cap × batch_buckets candidates no matter how dense a semantic
    region the stream has absorbed (the embedding mirror of
    ``neardup_stream.cap_new_bands``).

    Scale shape: existing bucket sizes are counted ONLY for buckets
    this batch touches (left-semi prune), so the store is never
    aggregated wholesale; the row_number window partitions by
    (tbl, bucket) over the BATCH's buckets. Saturated buckets stop
    recruiting — the same recall trade as ``filter_hot_buckets``,
    made once per bucket instead of per probe."""
    from pyspark.sql import Window

    w = Window.partitionBy("tbl", "bucket").orderBy("vec_id")
    ranked = new_bkt.withColumn("__rk", F.row_number().over(w))
    if store_bkt is None:
        return ranked.filter(F.col("__rk") <= cap).drop("__rk")
    touched = (
        store_bkt
        .join(new_bkt.select("tbl", "bucket").distinct(),
              ["tbl", "bucket"], "left_semi")
        .groupBy("tbl", "bucket")
        .agg(F.count(F.lit(1)).alias("__n_store"))
    )
    return (
        ranked.join(touched, ["tbl", "bucket"], "left")
        .filter(F.coalesce(F.col("__n_store"), F.lit(0))
                + F.col("__rk") <= cap)
        .drop("__rk", "__n_store")
    )


def batch_is_dense_flood(batch: DataFrame,
                         hot_share: float | None = None) -> bool:
    """Per-batch corpus-profile probe — the embedding mirror of
    ``neardup_stream.batch_is_template_flood``: does any LSH table
    put ≥ ``hot_share`` of THIS batch's vectors into one bucket? A
    dense semantic region (near-identical template embeddings)
    concentrates in the same hyperplane cell across tables — the
    exact load the dense-bucket cap exists to bound. Threshold is the
    same BOILER_HOT_SHARE the batch pipeline's ``auto`` path uses.

    Scale shape: the bucket assignment is the family the batch will
    compute anyway; the profile adds one (tbl, bucket) count shuffle
    and a per-tbl max/sum agg whose collect is N_TABLES rows."""
    from tpg_weather_etl_spark.queries_ml import BOILER_HOT_SHARE
    if hot_share is None:
        hot_share = BOILER_HOT_SHARE
    counts = (buckets_for_embeddings(batch)
              .groupBy("tbl", "bucket")
              .agg(F.count(F.lit(1)).alias("n")))
    shares = (counts.groupBy("tbl")
              .agg((F.max("n") / F.sum("n")).alias("share"))
              .collect())
    return any(r["share"] >= hot_share for r in shares)


def _verified_pairs(emb: DataFrame, cand: DataFrame,
                    tau: float) -> DataFrame:
    """Exact-cosine verify of (vec_a, vec_b) candidates against the
    given (vec_id, embedding) lookup — candidates only, never
    all-pairs. The cosine stays INLINE here (not the batch queries'
    hoisted form): per micro-batch the candidate pair count is far
    below the accumulated store size, so any per-row projection over
    the lookup side does more work than the pairs save."""
    from tpg_weather_etl_spark.queries_embeddings import _cos_rounded
    ea = emb.select(F.col("vec_id").alias("vec_a"),
                    F.col("embedding").alias("emb_a"))
    eb = emb.select(F.col("vec_id").alias("vec_b"),
                    F.col("embedding").alias("emb_b"))
    return (
        cand.join(ea, "vec_a").join(eb, "vec_b")
        .select("vec_a", "vec_b",
                _cos_rounded(F.col("emb_a"), F.col("emb_b")).alias("cos"))
        .filter(F.col("cos") >= tau)
    )


def _novel_in_batch(batch: DataFrame, tau: float,
                    bucket_cap: int | None = None) -> DataFrame:
    """Near-dup dedup WITHIN one micro-batch: LSH candidates, exact
    cosine verify, connected components, keep min vec_id per group."""
    from tpg_weather_etl_spark.operators.graph import (
        connected_components_min_label,
    )

    bkt = buckets_for_embeddings(batch)
    if bucket_cap is not None:
        # a dense-region flood must not pay batch² in its own self-join
        bkt = filter_hot_buckets(bkt, cap=bucket_cap)
    a = bkt.select(F.col("vec_id").alias("vec_a"), "tbl", "bucket")
    b = bkt.select(F.col("vec_id").alias("vec_b"),
                   F.col("tbl").alias("tbl_b"),
                   F.col("bucket").alias("bucket_b"))
    cand = (
        a.join(b, (F.col("tbl") == F.col("tbl_b"))
               & (F.col("bucket") == F.col("bucket_b"))
               & (F.col("vec_a") < F.col("vec_b")))
        .select("vec_a", "vec_b").distinct()
    )
    pairs = _verified_pairs(batch, cand, tau).select("vec_a", "vec_b")
    labels = connected_components_min_label(pairs, src="vec_a",
                                            dst="vec_b")
    losers = labels.filter(F.col("doc") != F.col("cluster")).select(
        F.col("doc").alias("vec_id")
    )
    return batch.join(losers, "vec_id", "left_anti")


def batch_novel_vs_store(batch: DataFrame,
                         store_vecs: DataFrame | None,
                         store_bkt: DataFrame | None,
                         tau: float = NEARDUP_TAU,
                         bucket_cap: int | None = None) -> DataFrame:
    """Drop batch vectors that near-dup anything already stored.

    Module-level so tests can drive it directly and assert the plan:
    the candidate semi-join prunes the store scan to matched ids
    before any full-vector read happens.

    With ``bucket_cap`` set, the store side is assumed cap-maintained
    (``cap_new_buckets`` at append time — the invariant the sink
    keeps), so the probe join is bounded without re-aggregating the
    store; the batch's own bucket table is capped here."""
    if store_vecs is not None:
        # replay gate first (idempotent foreachBatch contract)
        batch = batch.join(store_vecs.select("vec_id"), "vec_id",
                           "left_anti")
    novel = _novel_in_batch(batch, tau, bucket_cap=bucket_cap)
    if store_vecs is None or store_bkt is None:
        return novel
    bkt_new = buckets_for_embeddings(novel)
    if bucket_cap is not None:
        bkt_new = filter_hot_buckets(bkt_new, cap=bucket_cap)
    cand = (
        bkt_new.select(F.col("vec_id").alias("vec_a"), "tbl", "bucket")
        .join(store_bkt.select(F.col("vec_id").alias("vec_b"),
                               "tbl", "bucket"),
              ["tbl", "bucket"])
        .select("vec_a", "vec_b")
        .distinct()
    )
    # read ONLY the candidate store vectors (semi-join-pruned scan)
    cand_store = store_vecs.join(
        cand.select(F.col("vec_b").alias("vec_id")).distinct(),
        "vec_id", "left_semi",
    )
    dup_new = (
        _verified_pairs(novel.select("vec_id", "embedding")
                        .unionByName(cand_store.select("vec_id",
                                                       "embedding")),
                        cand, tau)
        .select(F.col("vec_a").alias("vec_id"))
        .distinct()
    )
    return novel.join(dup_new, "vec_id", "left_anti")


def incremental_embedding_dedup(spark: SparkSession, input_dir: str,
                                out_dir: str, buckets_dir: str,
                                checkpoint_dir: str,
                                tau: float = NEARDUP_TAU,
                                bucket_cap: int | None = None,
                                auto_cap: int | None = None):
    """Start the stream: drop-directory JSONL in, semantically-deduped
    vector store out, bucket store maintained alongside.

    ``bucket_cap`` (off by default) bounds every (tbl, bucket) group
    in the BUCKET STORE at append time and caps the batch-side bucket
    tables, so a dense-region flood cannot grow a hot bucket linearly
    with the corpus and turn each future batch's probe quadratic.
    Saturated buckets stop recruiting: a true mega-cluster arriving
    after saturation is the recall trade, same as the batch-side cap
    (SCALE.md rule 11).

    ``auto_cap`` (round 11, mutually exclusive with ``bucket_cap``):
    profile-derived cap — starts OFF, every batch is probed with
    ``batch_is_dense_flood``, and the first dense-flood batch flips
    the cap ON at ``auto_cap`` for itself and (via a durable marker
    next to the bucket store) every later batch and stream restart.
    One-way latch, same rationale as the text side."""

    if bucket_cap is not None and auto_cap is not None:
        raise ValueError("bucket_cap and auto_cap are mutually "
                         "exclusive: static cap or profile-derived "
                         "cap, not both")
    capon_marker = buckets_dir.rstrip("/") + "__capon"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark_b = batch_df.sparkSession
        cap = bucket_cap
        if auto_cap is not None:
            latched = _path_exists(spark_b, capon_marker)
            if not latched and batch_is_dense_flood(batch_df):
                latched = True
                _touch_marker(spark_b, capon_marker)
            cap = auto_cap if latched else None
        store_vecs = (spark_b.read.parquet(out_dir)
                      if _path_exists(spark_b, out_dir) else None)
        store_bkt = (spark_b.read.parquet(buckets_dir)
                     if _path_exists(spark_b, buckets_dir) else None)
        # localCheckpoint, NOT persist: the survivor plan READS
        # out_dir, and appending to out_dir triggers refreshByPath,
        # which invalidates any cache entry depending on that path —
        # the bucket write would then lazily RECOMPUTE survivors
        # against a listing including their own freshly-appended rows,
        # and the replay gate would self-dedup them to empty (the trap
        # neardup_stream.py documents; same store-read-then-append
        # shape here).
        survivors = batch_novel_vs_store(
            batch_df, store_vecs, store_bkt, tau=tau,
            bucket_cap=cap,
        ).localCheckpoint(eager=True)
        if survivors.isEmpty():
            return
        survivors.write.mode("append").parquet(out_dir)
        new_bkt = buckets_for_embeddings(survivors)
        if cap is not None:
            new_bkt = cap_new_buckets(new_bkt, store_bkt, cap)
        new_bkt.write.mode("append").parquet(buckets_dir)

    return (
        stream_embeddings(spark, input_dir)
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
