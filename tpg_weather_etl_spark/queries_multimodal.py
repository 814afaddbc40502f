"""Multimodal gate entry — rows-only check (no SQL oracle by design:
``mapInPandas`` feature extraction is not ANSI-SQL-expressible, so the
driver records the weaker ≥0-rows + stable-schema check for it).

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
    """Per-kind feature profile after Arrow-batched extraction."""
    feats = extract_features(synth_media(spark, sf_dir))
    return (
        feats.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum(F.col("feature").isNull().cast("int")).alias("n_failed"),
            F.avg(F.col("n_bytes").cast("double")).alias("avg_bytes"),
            F.avg(F.element_at(F.col("feature"), 1)).alias("avg_f0"),
        )
        .orderBy("kind")
    )


def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only media profile — pure Catalyst (the payload column
    is pruned at the scan), so unlike the mapInPandas feature path
    this one IS SQL-expressible and gets a full value-hash oracle."""
    from tpg_weather_etl_spark.operators.multimodal import metadata_stats
    return metadata_stats(synth_media(spark, sf_dir)).orderBy("kind")


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
    "multimodal_metadata": SQL_MULTIMODAL_METADATA,
}
