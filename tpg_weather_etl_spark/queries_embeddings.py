"""Embedding similarity-search gate over the ``embeddings`` table
(``vec_id bigint, embedding array<float>, label int``).

- ``embedding_topk``: brute-force cosine top-k — the correctness
  baseline. All arithmetic in double; similarity is rounded to 6
  decimals (+0.0 normalizes -0.0) *before* ranking so both engines
  rank identical values with the vec_id tiebreak.
- ``ann_buckets`` / ``ann_topk``: deterministic random-hyperplane LSH —
  the scale path. Hyperplane weights are the integer formula
  w(h,j) = ((h*73 + j*37) % 7) - 3, reproducible in any engine; the
  bucket id packs the 8 projection signs. At 100 TB the bucket join
  replaces the n² cross join; candidates are reranked by exact cosine
  within buckets.

Sign robustness: a projection within ~1e-12 of zero could flip its
bit across engines (summation order); with O(1)-magnitude embeddings
the probability is negligible, and the gate would surface it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tpg_weather_etl_spark.functions.vectors import cosine_similarity
from tpg_weather_etl_spark.sources.tables import read_table as t

N_PLANES = 8
N_QUERY_VECS = 10
EMB_DIM = 64  # testdata embedding dimensionality (oracle hardcodes it)


def _cos_rounded(a, b):
    return F.round(cosine_similarity(a, b), 6) + F.lit(0.0)


# ---------------------------------------------------------------------------
# Brute-force cosine top-k (baseline; exact)
# ---------------------------------------------------------------------------

def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    pairs = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "vec_id",
            _cos_rounded(F.col("q_emb"), F.col("embedding")).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )


SQL_EMBEDDING_TOPK = f"""
WITH q AS (SELECT vec_id AS qid,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
           FROM embeddings WHERE vec_id < {N_QUERY_VECS}),
a AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings),
p AS (SELECT qid, vec_id,
        round(list_dot_product(qe, e)
              / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(e, e))),
              6) + 0.0 AS cos
      FROM q CROSS JOIN a WHERE vec_id != qid)
SELECT qid, vec_id, cos, CAST(rank AS INTEGER) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY cos DESC, vec_id ASC) AS rank
      FROM p)
WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# Random-hyperplane LSH buckets (deterministic, engine-portable)
# ---------------------------------------------------------------------------

def _bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    planes = e.select(
        "vec_id", "embedding",
        F.explode(F.sequence(F.lit(0), F.lit(N_PLANES - 1))).alias("h"),
    )
    # proj = Σ_j emb[j] * w(h, j) as a sequential fold (deterministic)
    proj = F.aggregate(
        F.zip_with(
            F.transform(F.col("embedding"), lambda x: x.cast("double")),
            F.sequence(F.lit(0), F.size(F.col("embedding")) - 1),
            lambda x, j: x * (((F.col("h") * 73 + j * 37) % 7) - 3).cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    bits = planes.select(
        "vec_id", "h",
        F.when(proj > 0, F.expr("shiftleft(CAST(1 AS BIGINT), h)"))
         .otherwise(F.lit(0).cast("long")).alias("bit"),
    )
    return bits.groupBy("vec_id").agg(F.sum("bit").alias("bucket"))


def q_ann_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings").select("vec_id", "label")
    return (
        _bucketed(spark, sf_dir)
        .join(e, "vec_id")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vecs"),
             F.count_distinct(F.col("label")).alias("n_labels"))
    )


_SQL_BUCKETS = f"""
proj AS (
  SELECT vec_id, h,
    SUM(CAST(embedding[j+1] AS DOUBLE) * (((h*73 + j*37) % 7) - 3)) AS p
  FROM embeddings
  CROSS JOIN range(0, {N_PLANES}) t(h)
  CROSS JOIN range(0, {EMB_DIM}) s(j)
  GROUP BY vec_id, h),
bkt AS (
  SELECT vec_id,
    CAST(SUM(CASE WHEN p > 0 THEN (1::BIGINT << h) ELSE 0::BIGINT END)
         AS BIGINT) AS bucket
  FROM proj GROUP BY vec_id)
"""

SQL_ANN_BUCKETS = f"""
WITH {_SQL_BUCKETS}
SELECT bucket, COUNT(*) AS n_vecs, COUNT(DISTINCT label) AS n_labels
FROM bkt JOIN embeddings USING (vec_id)
GROUP BY bucket
"""


# ---------------------------------------------------------------------------
# ANN query: same-bucket candidates reranked by exact cosine
# ---------------------------------------------------------------------------

def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    bkt = _bucketed(spark, sf_dir)
    eb = e.join(bkt, "vec_id")
    q = eb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    cand = (
        eb.join(F.broadcast(q), (F.col("bucket") == F.col("q_bucket"))
                & (F.col("vec_id") != F.col("qid")))
        .select("qid", "vec_id",
                _cos_rounded(F.col("q_emb"), F.col("embedding")).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
    )


SQL_ANN_TOPK = f"""
WITH {_SQL_BUCKETS},
eb AS (SELECT e.vec_id, list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS e,
              b.bucket
       FROM embeddings e JOIN bkt b USING (vec_id)),
q AS (SELECT vec_id AS qid, e AS qe, bucket AS q_bucket
      FROM eb WHERE vec_id < {N_QUERY_VECS}),
cand AS (SELECT qid, vec_id,
           round(list_dot_product(qe, e)
                 / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(e, e))),
                 6) + 0.0 AS cos
         FROM eb JOIN q ON eb.bucket = q.q_bucket AND eb.vec_id != q.qid)
SELECT qid, vec_id, cos, CAST(rank AS INTEGER) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY cos DESC, vec_id ASC) AS rank
      FROM cand)
WHERE rank <= 3
"""


QUERIES = {
    "embedding_topk": q_embedding_topk,
    "ann_buckets": q_ann_buckets,
    "ann_topk": q_ann_topk,
}

ORACLE = {
    "embedding_topk": SQL_EMBEDDING_TOPK,
    "ann_buckets": SQL_ANN_BUCKETS,
    "ann_topk": SQL_ANN_TOPK,
}
