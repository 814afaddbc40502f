"""Incremental streaming NEAR-dup corpus dedup — the MinHash-LSH
companion to ``streaming/corpus_dedup.py`` (which is exact-content
only): a continuously-arriving document stream where each micro-batch
admits only documents that are neither exact dups, nor near-dups of
anything already in the corpus, nor near-dups of an earlier document
in the same batch.

Per batch:

1. exact gate — anti-join the batch's content fingerprints against
   the output store (idempotent replay: a re-run batch is fully
   absorbed here and emits nothing);
2. in-batch near-dups — banded-LSH candidates within the batch,
   exact-Jaccard verify, connected components, keep the min-id member
   per group (H2 tie rule);
3. cross-corpus near-dups — the batch's band keys probe the BAND
   STORE (one (doc_id, band, bkey) row per stored band, appended as
   docs are admitted). Candidate store docs are re-shingled from the
   output store ON DEMAND: a semi-join on the candidate ids prunes
   the store scan to the handful of matched documents, so the corpus
   text is never re-shingled wholesale;
4. survivors append to the output store; their bands append to the
   band store.

100 TB shape: the only store-sized joins key on ``bkey`` (band
probe) and ``doc_id`` (candidate semi-join) — both prunable/bucketed
— and per-batch work scales with the batch plus its candidates, not
the corpus. The band store is ~n_bands small rows per document:
state lives in tables, never in executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tpg_weather_etl_spark.functions.text import doc_fingerprint
from tpg_weather_etl_spark.streaming.corpus_dedup import (
    _path_exists,
    _touch_marker,
)

NEARDUP_TAU = 0.5


def batch_is_template_flood(batch: DataFrame,
                            hot_share: float | None = None) -> bool:
    """Per-batch corpus-profile probe — the streaming mirror of the
    batch curation pipeline's ``near_dup="auto"`` decision
    (queries_ml.q_curation_e2e): does any source in THIS batch open
    ≥ ``hot_share`` of its documents with the same
    BOILER_PREFIX_TOKENS-token prefix? That is the templated-source
    signature whose shared header shingles dominate every MinHash
    band and grow one band bucket linearly with the corpus — the
    exact load the bucket cap exists to bound.

    Scale shape: one map-side prefix slice over the batch, one
    (source, prefix) count shuffle, and a per-source max/sum agg
    whose result is ONE ROW PER SOURCE IN THE BATCH — the collect is
    bounded by the source vocabulary, not the batch size."""
    from tpg_weather_etl_spark.functions.text import norm_text
    from tpg_weather_etl_spark.queries_ml import BOILER_HOT_SHARE
    from tpg_weather_etl_spark.queries_text import BOILER_PREFIX_TOKENS
    if hot_share is None:
        hot_share = BOILER_HOT_SHARE
    pref = batch.select(
        "source",
        F.concat_ws(" ", F.slice(
            F.split(norm_text(F.col("text")), " "),
            1, BOILER_PREFIX_TOKENS)).alias("prefix"))
    counts = pref.groupBy("source", "prefix").agg(
        F.count(F.lit(1)).alias("n"))
    shares = (counts.groupBy("source")
              .agg((F.max("n") / F.sum("n")).alias("share"))
              .collect())
    return any(r["share"] >= hot_share for r in shares)


def cap_new_bands(new_bands: DataFrame, store_bands: DataFrame | None,
                  cap: int) -> DataFrame:
    """Append-time enforcement of the band-store bucket cap: a
    (band, bkey) bucket never grows past ``cap`` members, so every
    FUTURE batch's probe join against the store is bounded at
    cap x batch_bands candidates no matter how much boilerplate the
    stream has absorbed (SCALE.md rule 11.4's streaming flavor — a
    boilerplate flood arrives unannounced, and unlike the batch
    query there is no second chance to re-plan).

    Scale shape: existing bucket sizes are counted ONLY for the
    buckets this batch touches (left-semi prune on the batch's
    distinct band keys), so the store is never aggregated wholesale;
    the row_number window partitions by (band, bkey) over the BATCH's
    bands. Saturated buckets stop recruiting — the same recall trade
    as filter_hot_band_buckets, made once per bucket instead of per
    probe."""
    from pyspark.sql import Window

    w = Window.partitionBy("band", "bkey").orderBy("doc_id")
    ranked = new_bands.withColumn("__rk", F.row_number().over(w))
    if store_bands is None:
        return ranked.filter(F.col("__rk") <= cap).drop("__rk")
    touched = (
        store_bands
        .join(new_bands.select("band", "bkey").distinct(),
              ["band", "bkey"], "left_semi")
        .groupBy("band", "bkey")
        .agg(F.count(F.lit(1)).alias("__n_store"))
    )
    return (
        ranked.join(touched, ["band", "bkey"], "left")
        .filter(F.coalesce(F.col("__n_store"), F.lit(0))
                + F.col("__rk") <= cap)
        .drop("__rk", "__n_store")
    )


def _novel_in_batch(batch: DataFrame,
                    bucket_cap: int | None = None) -> DataFrame:
    """Exact + near-dup dedup WITHIN one micro-batch."""
    from pyspark.sql import Window

    from tpg_weather_etl_spark.operators.graph import (
        connected_components_min_label,
    )
    from tpg_weather_etl_spark.queries_text import (
        _pair_jaccard,
        bands_from_shingles,
        filter_hot_band_buckets,
        shingles_from_docs,
    )

    w = Window.partitionBy("fp").orderBy("doc_id")
    exact = (
        batch.withColumn("fp", doc_fingerprint(F.col("text")))
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )
    sh = shingles_from_docs(exact)
    bands = bands_from_shingles(sh)
    if bucket_cap is not None:
        # a flood batch must not pay batch^2 inside its own self-join
        bands = filter_hot_band_buckets(bands, cap=bucket_cap)
    a = bands.select(F.col("doc_id").alias("doc_a"), "bkey")
    b = bands.select(F.col("doc_id").alias("doc_b"), "bkey")
    cand = (
        a.join(b, "bkey")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    pairs = _pair_jaccard(sh, cand=cand).filter(
        F.col("jaccard") >= NEARDUP_TAU
    ).select("doc_a", "doc_b")
    labels = connected_components_min_label(pairs)
    losers = labels.filter(F.col("doc") != F.col("cluster")).select(
        F.col("doc").alias("doc_id")
    )
    return exact.join(losers, "doc_id", "left_anti")


def batch_novel_vs_store(batch: DataFrame, store_docs: DataFrame | None,
                         store_bands: DataFrame | None,
                         bucket_cap: int | None = None) -> DataFrame:
    """Drop batch docs that near-dup anything already stored.

    Module-level so tests can drive it directly and assert the plan:
    the candidate semi-join prunes the store scan to matched ids
    before any re-shingling happens.

    With ``bucket_cap`` set, the store side is assumed cap-maintained
    (cap_new_bands at append time — the invariant the sink keeps), so
    the probe join is bounded without re-aggregating the store; the
    batch's own band table is capped here.
    """
    from tpg_weather_etl_spark.queries_text import (
        _pair_jaccard,
        bands_from_shingles,
        filter_hot_band_buckets,
        shingles_from_docs,
    )

    novel = _novel_in_batch(batch, bucket_cap=bucket_cap)
    if store_docs is None or store_bands is None:
        return novel
    # exact replay gate first (idempotent foreachBatch contract)
    novel = novel.join(store_docs.select("fp"), "fp", "left_anti")
    sh_new = shingles_from_docs(novel)
    bands_new = bands_from_shingles(sh_new)
    if bucket_cap is not None:
        bands_new = filter_hot_band_buckets(bands_new, cap=bucket_cap)
    cand = (
        bands_new.select(F.col("doc_id").alias("doc_a"), "bkey")
        .join(store_bands.select(F.col("doc_id").alias("doc_b"), "bkey"),
              "bkey")
        .select("doc_a", "doc_b")
        .distinct()
    )
    # re-shingle ONLY the candidate store docs (semi-join-pruned scan)
    cand_store_docs = store_docs.join(
        cand.select(F.col("doc_b").alias("doc_id")).distinct(),
        "doc_id", "left_semi",
    )
    sh_store = shingles_from_docs(cand_store_docs)
    dup_new = (
        _pair_jaccard(sh_new.unionByName(sh_store), cand=cand)
        .filter(F.col("jaccard") >= NEARDUP_TAU)
        .select(F.col("doc_a").alias("doc_id"))
        .distinct()
    )
    return novel.join(dup_new, "doc_id", "left_anti")


def incremental_neardup(spark: SparkSession, input_dir: str,
                        out_dir: str, bands_dir: str,
                        checkpoint_dir: str,
                        bucket_cap: int | None = None,
                        auto_cap: int | None = None):
    """Start the stream: drop-directory JSONL in, near-dup-free
    corpus out, band store maintained alongside.

    ``bucket_cap`` (off by default — behavior identical to previous
    rounds) bounds every (band, bkey) bucket in the BAND STORE at
    append time and caps the batch-side band tables, so a boilerplate
    flood cannot grow a hot bucket linearly with the corpus and turn
    each future batch's probe quadratic. Saturated buckets stop
    recruiting: a true mega-cluster arriving after saturation is the
    recall trade, same as the batch-side cap (SCALE.md rule 11.4).

    ``auto_cap`` (round 11, VERDICT r10 item 5, mutually exclusive
    with ``bucket_cap``): the streaming flavor of the batch
    pipeline's ``near_dup="auto"`` — the cap starts OFF (full recall,
    no recruiting limit) and every batch is first profiled with
    ``batch_is_template_flood``; the first batch whose dominant
    per-source prefix share crosses BOILER_HOT_SHARE flips the cap ON
    at ``auto_cap`` for that batch and, via a durable marker next to
    the band store, for every later batch and stream restart (a
    one-way latch: saturated buckets can't be un-recruited, so
    flipping back off would only re-open the quadratic)."""
    from tpg_weather_etl_spark.queries_text import (
        bands_from_shingles,
        shingles_from_docs,
    )
    from tpg_weather_etl_spark.streaming.corpus_dedup import (
        stream_documents,
    )

    if bucket_cap is not None and auto_cap is not None:
        raise ValueError("bucket_cap and auto_cap are mutually "
                         "exclusive: static cap or profile-derived "
                         "cap, not both")
    capon_marker = bands_dir.rstrip("/") + "__capon"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark_b = batch_df.sparkSession
        cap = bucket_cap
        if auto_cap is not None:
            latched = _path_exists(spark_b, capon_marker)
            if not latched and batch_is_template_flood(batch_df):
                latched = True
                _touch_marker(spark_b, capon_marker)
            cap = auto_cap if latched else None
        store_docs = (spark_b.read.parquet(out_dir)
                      if _path_exists(spark_b, out_dir) else None)
        store_bands = (spark_b.read.parquet(bands_dir)
                       if _path_exists(spark_b, bands_dir) else None)
        # localCheckpoint, NOT persist: the survivor plan READS
        # out_dir, and appending to out_dir triggers refreshByPath,
        # which invalidates any cache entry depending on that path —
        # the band write would then lazily RECOMPUTE survivors against
        # a listing that includes their own freshly-appended rows, and
        # the exact-fp gate would self-dedup them to empty (observed:
        # corpus updated, band store silently not). Checkpointing
        # truncates the lineage, so both writes read frozen data.
        survivors = batch_novel_vs_store(
            batch_df, store_docs, store_bands, bucket_cap=cap
        ).localCheckpoint(eager=True)
        if survivors.isEmpty():
            return
        survivors.write.mode("append").parquet(out_dir)
        new_bands = bands_from_shingles(shingles_from_docs(survivors))
        if cap is not None:
            new_bands = cap_new_bands(new_bands, store_bands, cap)
        new_bands.write.mode("append").parquet(bands_dir)

    return (
        stream_documents(spark, input_dir)
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
