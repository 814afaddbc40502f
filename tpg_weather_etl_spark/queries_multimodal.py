"""Multimodal gate entries — both value-hash oracled since round 6.

``multimodal_features`` drives the Arrow-batched ``mapInPandas``
decode; its stub decoder's byte fold is replayed exactly in DuckDB
(hex-byte extraction + list_reduce), closing the former rows-only gap.

The testdata ships no binary media table, so the query synthesizes one
from ``documents`` (payload = utf-8 bytes of the text, kind cycled from
doc_id) and drives the REAL multimodal plumbing end-to-end: typed media
schema → Arrow-batched ``mapInPandas`` decode (deterministic stub
decoder, operators/multimodal.py) → per-kind feature aggregation. The
decode stub is the only fake; the Spark plan — binary column transport
through Arrow record batches, null/poison payload handling, post-UDF
aggregation — is exactly the production shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tpg_weather_etl_spark.operators.multimodal import extract_features
from tpg_weather_etl_spark.sources.tables import read_table as t

KINDS = ("image", "audio", "video")


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → MEDIA_SCHEMA-shaped frame with opaque binary payloads."""
    d = t(spark, sf_dir, "documents")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.when(F.col("doc_id") % 3 == 0, (F.col("doc_id") % 512 + 16).cast("int"))
         .alias("width"),
        F.when(F.col("doc_id") % 3 == 0, (F.col("doc_id") % 384 + 16).cast("int"))
         .alias("height"),
        F.when(F.col("doc_id") % 3 != 0, (F.col("doc_id") * 40 + 1000))
         .alias("duration_ms"),
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-kind feature profile after Arrow-batched extraction.

    Hash-oracled since round 6: the stub decoder's per-lane byte fold
    ``acc = (acc*31 + byte) % 997`` is integer-valued before the final
    /997 normalization, so summing ``round(feature[k] * 997)`` recovers
    the exact integer accumulators (float32 error ~1e-4 « 0.5) and the
    DuckDB oracle replays the same fold via hex-byte extraction +
    ``list_reduce`` — order-dependent float averaging never enters the
    compared columns. Codec-backed decoding (JPEG/MP3/H.264) remains
    the only unverified surface, behind the same ``decode_fn`` seam.
    """
    feats = extract_features(synth_media(spark, sf_dir))
    lane = (lambda k: F.round(F.element_at(F.col("feature"), k)
                              * 997).cast("long"))
    return (
        feats.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum(F.col("feature").isNull().cast("int")).alias("n_failed"),
            F.avg(F.col("n_bytes").cast("double")).alias("avg_bytes"),
            F.sum(lane(1)).alias("f0_units"),
            F.sum(lane(8)).alias("f7_units"),
        )
        .orderBy("kind")
    )


def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only media profile — pure Catalyst (the payload column
    is pruned at the scan), so unlike the mapInPandas feature path
    this one IS SQL-expressible and gets a full value-hash oracle."""
    from tpg_weather_etl_spark.operators.multimodal import metadata_stats
    return metadata_stats(synth_media(spark, sf_dir)).orderBy("kind")


SQL_MULTIMODAL_FEATURES = """
WITH m AS (
  SELECT doc_id,
    (['image','audio','video'])[CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
    text
  FROM documents),
b AS (
  SELECT kind, text,
    octet_length(encode(text)) AS nb,
    hex(encode(text)) AS hx
  FROM m),
f AS (
  SELECT kind, nb, text,
    CASE WHEN text IS NULL THEN NULL
         WHEN nb <= 0 THEN 0
         ELSE list_reduce(
           list_transform(range(0, CAST(ceil(nb / 8.0) AS BIGINT)),
             i -> CAST('0x' || substr(hx, CAST(16*i + 1 AS BIGINT), 2)
                       AS BIGINT)),
           (a, x) -> (a * 31 + x) % 997) END AS f0_units,
    CASE WHEN text IS NULL THEN NULL
         WHEN nb <= 7 THEN 0
         ELSE list_reduce(
           list_transform(range(0, CAST(ceil((nb - 7) / 8.0) AS BIGINT)),
             i -> CAST('0x' || substr(hx, CAST(16*i + 15 AS BIGINT), 2)
                       AS BIGINT)),
           (a, x) -> (a * 31 + x) % 997) END AS f7_units
  FROM b)
SELECT kind,
  COUNT(*) AS n_media,
  CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
  AVG(CAST(nb AS DOUBLE)) AS avg_bytes,
  CAST(SUM(f0_units) AS BIGINT) AS f0_units,
  CAST(SUM(f7_units) AS BIGINT) AS f7_units
FROM f GROUP BY kind ORDER BY kind
"""


SQL_MULTIMODAL_METADATA = """
WITH m AS (
  SELECT doc_id AS media_id,
    (['image','audio','video'])[CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
    encode(text) AS content,
    CASE WHEN doc_id % 3 = 0
         THEN CAST(doc_id % 512 + 16 AS INTEGER) END AS width,
    CASE WHEN doc_id % 3 = 0
         THEN CAST(doc_id % 384 + 16 AS INTEGER) END AS height,
    CASE WHEN doc_id % 3 != 0
         THEN doc_id * 40 + 1000 END AS duration_ms
  FROM documents)
SELECT kind, COUNT(*) AS n,
  AVG(CAST(octet_length(content) AS DOUBLE)) AS avg_bytes,
  AVG(width) AS avg_width,
  AVG(duration_ms) AS avg_duration_ms
FROM m GROUP BY kind
"""


QUERIES = {
    "multimodal_features": q_multimodal_features,
    "multimodal_metadata": q_multimodal_metadata,
}

ORACLE: dict[str, str] = {
    "multimodal_features": SQL_MULTIMODAL_FEATURES,
    "multimodal_metadata": SQL_MULTIMODAL_METADATA,
}
