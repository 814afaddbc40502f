"""Core relational query gate — one entry per SURVEY.md §2 operator
class, expressed over the driver's TPC-H-ish testdata tables, each with
an exact DuckDB oracle.

Float-parity strategy (so order-insensitive value hashes match):
- counts            → bigint (exact both engines)
- sums/avgs of doubles → route through DECIMAL(24,8): decimal summation
  is exact and order-independent, then cast the final value to DOUBLE.
  Scale 8 exceeds the true decimal scale of every product of 2-decimal
  inputs, so the double→decimal cast never lands on a rounding tie and
  so results are bit-identical and deterministic under AQE re-ordering.
- medians           → both engines use exact interpolating median.
- p90               → exact *discrete* quantile (DuckDB quantile_disc
  semantics: sorted 1-based index ceil(p*n)) via operators.quantiles.
- transcendentals   → rounded to 6 decimals on both sides.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tpg_weather_etl_spark.functions.macros import (
    minute_diff,
    rain_bin,
    second_diff,
    temp_bin,
    wind_bin,
)
from tpg_weather_etl_spark.functions.time import (
    cyclic_hour_cos,
    cyclic_hour_sin,
    dow_monday0,
    epoch_us,
    month_key,
    time_bin,
)
from tpg_weather_etl_spark.operators.asof import asof_join
from tpg_weather_etl_spark.operators.dedupe import priority_dedupe
from tpg_weather_etl_spark.operators.quantiles import with_group_quantiles
from tpg_weather_etl_spark.operators.sampling import (
    deterministic_sample,
    deterministic_sample_sql,
)


from tpg_weather_etl_spark.sources.tables import read_table as t  # noqa: E402


def _dsum(col) -> F.Column:
    """Order-independent, engine-portable exact sum of a double expr.

    Sum in DECIMAL(24,8) (exact, order-independent under AQE), round to
    scale 4 and shrink to DECIMAL(18,4) *before* casting to double: the
    shrunken unscaled integer stays below 2^53, where the decimal→double
    conversion is exact in both Spark (BigDecimal.doubleValue) and
    DuckDB (int128 / 10^scale) — at scale 8 DuckDB double-rounds and
    the engines disagree in the last ulp.
    """
    return (
        F.round(F.sum(col.cast("decimal(24,8)")), 4)
        .cast("decimal(18,4)")
        .cast("double")
    )


def _davg(col) -> F.Column:
    return (F.sum(col.cast("decimal(24,8)")).cast("double")
            / F.count(col)).alias("avg")


# ---------------------------------------------------------------------------
# A8 flagship: pricing summary (grouped hash-agg; TPC-H Q1 shape)
# parity: reference A8 grouped feature aggregation
# (11_build_features_by_stop_line.py:103-135)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price).alias("sum_disc_price"),
            _dsum(charge).alias("sum_charge"),
            (_dsum(F.col("l_quantity")) / F.count("l_quantity")).alias("avg_qty"),
            (_dsum(F.col("l_extendedprice")) / F.count("l_extendedprice")).alias("avg_price"),
            (_dsum(F.col("l_discount")) / F.count("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
  CAST(CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(24,8))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS sum_qty,
  CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,8))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS sum_base_price,
  CAST(CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(24,8))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(24,8))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS sum_charge,
  CAST(CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(24,8))), 4) AS DECIMAL(18,4)) AS DOUBLE)/COUNT(l_quantity) AS avg_qty,
  CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,8))), 4) AS DECIMAL(18,4)) AS DOUBLE)/COUNT(l_extendedprice) AS avg_price,
  CAST(CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(24,8))), 4) AS DECIMAL(18,4)) AS DOUBLE)/COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# J1+O2: top revenue orders (broadcast dim join + agg + top-k)
# ---------------------------------------------------------------------------

def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = t(spark, sf_dir, "lineitem")
    return (
        # orders/customer grow with SF — no broadcast hint; AQE
        # broadcasts at runtime iff the filtered side is actually
        # small, which is the only safe call at 100 TB
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


SQL_TOP_ORDERS = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
  CAST(CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(24,8))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# J-chain: revenue by nation (multi-broadcast star join; TPC-H Q5 shape)
# ---------------------------------------------------------------------------

def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem")
    return (
        # supplier/customer scale with SF (unhinted, AQE decides);
        # nation/region are constant-size (25/5 rows) — hint those
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


SQL_REGION_REVENUE = """
SELECT n_name,
  CAST(CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(24,8))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE' AND c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# J2: left-semi join cascade (reference GTFS subset filtering,
# 01_ingest_gtfs.py:178,199,223)
# ---------------------------------------------------------------------------

def q_semi_join_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return p.join(l, p.p_partkey == l.l_partkey, "left_semi").select(
        "p_partkey", "p_name", "p_brand", "p_size"
    )


SQL_SEMI_JOIN_PARTS = """
SELECT p_partkey, p_name, p_brand, p_size
FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)
"""


# ---------------------------------------------------------------------------
# Anti join (reference K6 delete-matching semantics, 03_ingest_weather.py:267-276)
# ---------------------------------------------------------------------------

def q_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


SQL_ANTI_JOIN_CUSTOMERS = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


# ---------------------------------------------------------------------------
# J1 + P5: left equi join enrich + IN-list-or-NULL predicate
# (reference 01_ingest_gtfs.py:147-150; 02_ingest_istdaten.py:258)
# ---------------------------------------------------------------------------

def q_left_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left")  # SF-scaling dim: AQE decides
        .filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            | F.col("o_orderpriority").isNull()
        )
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")).alias("segment"),
            "o_totalprice",
        )
    )


SQL_LEFT_JOIN_ENRICH = """
SELECT o_orderkey, o_orderpriority,
       COALESCE(c_mktsegment, 'UNKNOWN') AS segment, o_totalprice
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
WHERE o_orderpriority IN ('1-URGENT','2-HIGH') OR o_orderpriority IS NULL
"""


# ---------------------------------------------------------------------------
# A1: exact dedupe (reference drop_duplicates, 01_ingest_gtfs.py:160)
# ---------------------------------------------------------------------------

def q_dedupe_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "events").select("user_id", "event_type").dropDuplicates()


SQL_DEDUPE_EXACT = "SELECT DISTINCT user_id, event_type FROM events"


# ---------------------------------------------------------------------------
# A2: priority dedupe — top-1 per business key under multi-column
# priority (reference 02_ingest_istdaten.py:271-325, incl. H2 tiebreak)
# ---------------------------------------------------------------------------

def _event_rank():
    return (
        F.when(F.col("event_type") == "purchase", 3)
        .when(F.col("event_type") == "signup", 2)
        .when(F.col("event_type") == "click", 1)
        .otherwise(0)
    )


def q_dedupe_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    best = priority_dedupe(
        e,
        key_cols=["user_id", "day"],
        priority=[_event_rank().desc(), F.col("value").desc(), F.col("ts").desc()],
        tiebreak=[F.col("event_id").desc()],
    )
    return best.select("user_id", "day", "event_id", "event_type", "value")


SQL_DEDUPE_PRIORITY = """
SELECT user_id, CAST(ts AS DATE) AS day, event_id, event_type, value
FROM events
QUALIFY row_number() OVER (
  PARTITION BY user_id, CAST(ts AS DATE)
  ORDER BY CASE event_type WHEN 'purchase' THEN 3 WHEN 'signup' THEN 2
                           WHEN 'click' THEN 1 ELSE 0 END DESC,
           value DESC, ts DESC, event_id DESC
) = 1
"""


# ---------------------------------------------------------------------------
# A3: per-group median collapse (reference weather collision dedupe,
# 03_ingest_weather.py:172-217)
# ---------------------------------------------------------------------------

def q_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        (_dsum(F.col("value")) / F.count("value")).alias("avg_value"),
        F.median("value").alias("med_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


SQL_GROUP_MEDIAN = """
SELECT user_id, COUNT(*) AS n,
  CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(24,8))), 4) AS DECIMAL(18,4)) AS DOUBLE)/COUNT(value) AS avg_value,
  MEDIAN(value) AS med_value,
  MIN(value) AS min_value, MAX(value) AS max_value
FROM events GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# A8 on the event grid: 10-min-bin grouped features with exact discrete
# p90 (hazard H3) — mirror of 11_build_features_by_stop_line.py:103-135
# ---------------------------------------------------------------------------

def q_agg_by_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").withColumn("bin10", time_bin(F.col("ts"), 10))
    extra = [
        F.count(F.lit(1)).alias("n_events"),
        (_dsum(F.col("value")) / F.count("value")).alias("value_avg"),
        F.median("value").alias("value_p50"),
        (F.sum(F.when(F.col("value") >= 20.0, 1).otherwise(0)).cast("double")
         / F.count(F.lit(1))).alias("share_ge20"),
        F.max("value").alias("value_max"),
    ]
    return with_group_quantiles(
        e, ["event_type", "bin10"], "value",
        quantiles={"value_p90": 0.9}, extra_aggs=extra,
    )


SQL_AGG_BY_BIN = """
SELECT event_type,
  make_timestamp((CAST(floor(epoch(ts)/600) AS BIGINT))*600*1000000) AS bin10,
  COUNT(*) AS n_events,
  CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(24,8))), 4) AS DECIMAL(18,4)) AS DOUBLE)/COUNT(value) AS value_avg,
  MEDIAN(value) AS value_p50,
  CAST(SUM(CASE WHEN value >= 20.0 THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS share_ge20,
  MAX(value) AS value_max,
  quantile_disc(value, 0.9) AS value_p90
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# A4: dominant group (argmax by count, 10_build_features.py:96-107)
# ---------------------------------------------------------------------------

def q_dominant_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("event_type"))
        .limit(1)
    )


SQL_DOMINANT_EVENT_TYPE = """
SELECT event_type, COUNT(*) AS n FROM events
GROUP BY event_type ORDER BY n DESC, event_type ASC LIMIT 1
"""


# ---------------------------------------------------------------------------
# A5+A6: distinct month keys + min/max bounds (02:450; 03:97-99)
# ---------------------------------------------------------------------------

def q_distinct_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.select(month_key(F.col("o_orderdate")).alias("ym"))
        .distinct()
        .orderBy("ym")
    )


SQL_DISTINCT_MONTHS = """
SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS ym FROM orders ORDER BY ym
"""


def q_minmax_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
    )


SQL_MINMAX_BOUNDS = """
SELECT event_type, MIN(ts) AS ts_min, MAX(ts) AS ts_max,
       MIN(value) AS value_min, MAX(value) AS value_max,
       COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# A10: column-wise null-rate profile (app/streamlit_app.py:142-148)
# ---------------------------------------------------------------------------

def q_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return e.agg(
        *[
            F.avg(F.col(c).isNull().cast("double")).alias(f"nullrate_{c}")
            for c in ["event_id", "ts", "user_id", "event_type", "value", "props"]
        ]
    )


SQL_NULL_PROFILE = """
SELECT
  AVG(CASE WHEN event_id IS NULL THEN 1.0 ELSE 0.0 END) AS nullrate_event_id,
  AVG(CASE WHEN ts IS NULL THEN 1.0 ELSE 0.0 END) AS nullrate_ts,
  AVG(CASE WHEN user_id IS NULL THEN 1.0 ELSE 0.0 END) AS nullrate_user_id,
  AVG(CASE WHEN event_type IS NULL THEN 1.0 ELSE 0.0 END) AS nullrate_event_type,
  AVG(CASE WHEN value IS NULL THEN 1.0 ELSE 0.0 END) AS nullrate_value,
  AVG(CASE WHEN props IS NULL THEN 1.0 ELSE 0.0 END) AS nullrate_props
FROM events
"""


# ---------------------------------------------------------------------------
# W2/O2: latest row per key + global top-k
# (10_build_features.py:177; app/streamlit_app.py:81-94)
# ---------------------------------------------------------------------------

def q_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


SQL_LATEST_PER_USER = """
SELECT user_id, event_id, ts, event_type, value FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


def q_topk_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return (
        e.orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(50)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


SQL_TOPK_LATEST = """
SELECT event_id, ts, user_id, event_type, value FROM events
ORDER BY ts DESC, event_id DESC LIMIT 50
"""


# ---------------------------------------------------------------------------
# O3: deterministic sample (engine-portable LCG; reference fixed-seed
# sample app/streamlit_app.py:100-109)
# ---------------------------------------------------------------------------

def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return deterministic_sample(e, "event_id", 5).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


SQL_DETERMINISTIC_SAMPLE = f"""
SELECT event_id, ts, user_id, event_type, value FROM events
WHERE {deterministic_sample_sql('event_id', 5)}
"""


# ---------------------------------------------------------------------------
# F-series scalar layer: binning macros + time features
# (common.py:221-256; 10_build_features.py:227-232; DDL common.py:189)
# ---------------------------------------------------------------------------

def q_scalar_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    binned = e.select(
        rain_bin(F.col("value") / 20.0).alias("rain_b"),
        wind_bin(F.col("value") / 10.0).alias("wind_b"),
        temp_bin(F.col("value") / 10.0 - 10.0).alias("temp_b"),
    )
    return binned.groupBy("rain_b", "wind_b", "temp_b").agg(
        F.count(F.lit(1)).alias("n")
    )


SQL_SCALAR_BINS = """
WITH binned AS (
  SELECT
    CASE WHEN value/20.0 IS NULL THEN NULL
         WHEN value/20.0 <= 0.0 THEN 'no_rain'
         WHEN value/20.0 < 0.5 THEN 'drizzle'
         WHEN value/20.0 < 2.0 THEN 'light'
         WHEN value/20.0 < 5.0 THEN 'moderate'
         ELSE 'heavy' END AS rain_b,
    CASE WHEN value/10.0 IS NULL THEN NULL
         WHEN value/10.0 < 4.0 THEN 'calm'
         WHEN value/10.0 < 8.0 THEN 'breeze'
         WHEN value/10.0 < 14.0 THEN 'moderate'
         WHEN value/10.0 < 21.0 THEN 'fresh'
         ELSE 'strong' END AS wind_b,
    CASE WHEN value/10.0 - 10.0 IS NULL THEN NULL
         WHEN value/10.0 - 10.0 < 0.0 THEN 'below_0'
         WHEN value/10.0 - 10.0 < 10.0 THEN '0_10'
         WHEN value/10.0 - 10.0 < 20.0 THEN '10_20'
         WHEN value/10.0 - 10.0 < 30.0 THEN '20_30'
         ELSE 'ge_30' END AS temp_b
  FROM events)
SELECT rain_b, wind_b, temp_b, COUNT(*) AS n
FROM binned GROUP BY 1,2,3
"""


def q_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    b = time_bin(F.col("ts"), 10)
    return e.select(
        "event_id",
        F.hour("ts").alias("hour"),
        dow_monday0(F.col("ts")).alias("dow"),
        month_key(F.col("ts")).alias("ym"),
        b.alias("bin10"),
        minute_diff(b, F.col("ts")).alias("mins_into_bin"),
        second_diff(b, F.col("ts")).alias("secs_into_bin"),
        (F.round(cyclic_hour_sin(F.hour("ts")), 6) + F.lit(0.0)).alias("sin_hour"),
        (F.round(cyclic_hour_cos(F.hour("ts")), 6) + F.lit(0.0)).alias("cos_hour"),
    )


SQL_TIME_FEATURES = """
SELECT event_id,
  CAST(hour(ts) AS INTEGER) AS hour,
  CAST((dayofweek(ts) + 6) % 7 AS INTEGER) AS dow,
  strftime(ts, '%Y-%m') AS ym,
  make_timestamp((CAST(floor(epoch(ts)/600) AS BIGINT))*600*1000000) AS bin10,
  date_diff('minute', make_timestamp((CAST(floor(epoch(ts)/600) AS BIGINT))*600*1000000), ts) AS mins_into_bin,
  date_diff('second', make_timestamp((CAST(floor(epoch(ts)/600) AS BIGINT))*600*1000000), ts) AS secs_into_bin,
  round(sin(CAST(hour(ts) AS DOUBLE) * 2 * pi() / 24), 6) + 0.0 AS sin_hour,
  round(cos(CAST(hour(ts) AS DOUBLE) * 2 * pi() / 24), 6) + 0.0 AS cos_hour
FROM events
"""


# ---------------------------------------------------------------------------
# W4: lag features over the bin grid (DDL common.py:191)
# ---------------------------------------------------------------------------

def q_lag_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").withColumn("bin10", time_bin(F.col("ts"), 10))
    g = e.groupBy("event_type", "bin10").agg(
        F.count(F.lit(1)).alias("n_events"),
        (_dsum(F.col("value")) / F.count("value")).alias("value_avg"),
    )
    w = Window.partitionBy("event_type").orderBy("bin10")
    return g.select(
        "event_type", "bin10", "n_events", "value_avg",
        F.lag("value_avg", 1).over(w).alias("value_avg_lag1"),
        F.lag("value_avg", 2).over(w).alias("value_avg_lag2"),
    )


SQL_LAG_GRID = """
WITH g AS (
  SELECT event_type,
    make_timestamp((CAST(floor(epoch(ts)/600) AS BIGINT))*600*1000000) AS bin10,
    COUNT(*) AS n_events,
    CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(24,8))), 4) AS DECIMAL(18,4)) AS DOUBLE)/COUNT(value) AS value_avg
  FROM events GROUP BY 1,2)
SELECT event_type, bin10, n_events, value_avg,
  lag(value_avg, 1) OVER (PARTITION BY event_type ORDER BY bin10) AS value_avg_lag1,
  lag(value_avg, 2) OVER (PARTITION BY event_type ORDER BY bin10) AS value_avg_lag2
FROM g
"""


# ---------------------------------------------------------------------------
# W3: rolling trailing-window aggregates per key (planned module
# 12_build_feature_training_row; DDL common.py:185-187)
# ---------------------------------------------------------------------------

def q_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_us(F.col("ts")))
        .rangeBetween(-7 * 86400 * 1_000_000, 0)
    )
    return e.select(
        "event_id", "user_id", "ts",
        F.count(F.lit(1)).over(w).alias("n_7d"),
        F.expr("percentile(value, 0.5)").over(w).alias("med_7d"),
        F.max("value").over(w).alias("max_7d"),
    )


SQL_ROLLING_7D = """
SELECT event_id, user_id, ts,
  COUNT(*) OVER w AS n_7d,
  MEDIAN(value) OVER w AS med_7d,
  MAX(value) OVER w AS max_7d
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# J4: as-of join onto a gappy 30-min observation grid
# (10_build_features.py:168-179 general form; grid candidate equi-join
# is the 100 TB plan — see operators/asof.py)
# ---------------------------------------------------------------------------

def _obs_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").withColumn("obin", time_bin(F.col("ts"), 30))
    g = e.groupBy("event_type", "obin").agg(
        (_dsum(F.col("value")) / F.count("value")).alias("obs_value")
    )
    # deterministically knock out ~30% of grid cells → as-of has real
    # work (high-bit LCG bucket — see operators/sampling.py:lcg_bucket
    # for why not `state % 100`: 30-min bins make the key column
    # all-even-epochs half the day, where low bits degenerate)
    state = ((F.unix_timestamp("obin") / 1800).cast("long")
             * 1103515245 + 12345) % 2147483648
    keep = F.floor((state * 100) / F.lit(2147483648)) < 70
    return g.filter(keep)


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").withColumn("ebin", time_bin(F.col("ts"), 30))
    obs = _obs_grid(spark, sf_dir).withColumnRenamed("obin", "obs_ts")
    joined = asof_join(
        e, obs, left_ts="ebin", right_ts="obs_ts", on=["event_type"],
        tolerance_minutes=60, grid_minutes=30, how="left",
    )
    return joined.select(
        "event_id", "event_type", "ebin", "obs_ts", "obs_value"
    )


SQL_ASOF_JOIN = """
WITH g AS (
  SELECT event_type,
    make_timestamp((CAST(floor(epoch(ts)/1800) AS BIGINT))*1800*1000000) AS obin,
    CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(24,8))), 4) AS DECIMAL(18,4)) AS DOUBLE)/COUNT(value) AS obs_value
  FROM events GROUP BY 1,2),
obs AS (
  SELECT * FROM g
  WHERE CAST(floor((((CAST(floor(epoch(obin)/1800) AS BIGINT) * 1103515245 + 12345) % 2147483648) * 100) / 2147483648) AS BIGINT) < 70),
e AS (
  SELECT event_id, event_type,
    make_timestamp((CAST(floor(epoch(ts)/1800) AS BIGINT))*1800*1000000) AS ebin
  FROM events)
SELECT e.event_id, e.event_type, e.ebin, o.obin AS obs_ts, o.obs_value
FROM e LEFT JOIN obs o
  ON o.event_type = e.event_type
 AND o.obin <= e.ebin AND o.obin >= e.ebin - INTERVAL 60 MINUTES
QUALIFY o.obin IS NOT DISTINCT FROM MAX(o.obin) OVER (PARTITION BY e.event_id)
"""


# ---------------------------------------------------------------------------
# Grouping sets: ROLLUP with grouping_id — subtotal/grand-total levels
# in one pass (Spark expands to a single Expand + hash agg; no extra
# scans at any scale)
# ---------------------------------------------------------------------------

def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order revenue at detail / per-status / grand-total levels via
    ROLLUP. ``grouping_id`` disambiguates NULL-as-subtotal from a NULL
    group value; DuckDB's ``GROUPING(a,b)`` uses the identical bitmask
    (verified: detail=0, per-a subtotal=1, grand total=3).

    Scale shape: one Expand (×3 rows) feeding one hash aggregate with
    map-side combine — ROLLUP never re-scans per level.
    """
    o = t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("revenue"),
            F.grouping_id().cast("int").alias("gid"),
        )
    )


SQL_ROLLUP_REVENUE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
  CAST(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(24,8))), 4)
       AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
  CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


# ---------------------------------------------------------------------------
# PIVOT: long→wide reshaping with a pinned value list
# ---------------------------------------------------------------------------

PIVOT_TYPES = ("click", "view", "purchase", "signup", "error")


def q_pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user-bucket event-type value sums, one column per type, via
    ``groupBy().pivot()`` with an explicit value list (pinning values
    skips Spark's extra distinct-discovery job AND makes the schema
    static — both required at scale and for parity; the oracle is the
    equivalent conditional-sum form).
    """
    e = t(spark, sf_dir, "events")
    wide = (
        e.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .pivot("event_type", list(PIVOT_TYPES))
        .agg(_dsum(F.col("value")))
    )
    return wide.select(
        "user_bucket",
        *[F.coalesce(F.col(p), F.lit(0.0)).alias(f"v_{p}")
          for p in PIVOT_TYPES],
    )


SQL_PIVOT_EVENT_VALUES = """
SELECT user_id % 10 AS user_bucket,
  {cols}
FROM events GROUP BY 1
""".format(cols=",\n  ".join(
    "coalesce(CAST(CAST(ROUND(SUM(CASE WHEN event_type = '{p}' "
    "THEN CAST(value AS DECIMAL(24,8)) END), 4) "
    "AS DECIMAL(18,4)) AS DOUBLE), 0.0) AS v_{p}".format(p=p)
    for p in PIVOT_TYPES
))


# ---------------------------------------------------------------------------
# Interval (range) join via bin bucketing — the general form of the
# reference's grid-equi weather join (J3/J4): point-in-window joins as
# a hash equi-join on time bins + residual predicate, never a
# nested-loop join
# ---------------------------------------------------------------------------

IVJOIN_WINDOW_H = 2


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic inside every high-value-purchase 2-hour promo window:
    each qualifying purchase opens ``[ts, ts+2h)``; count and sum all
    events landing in each window.

    Runs through ``operators.ranges.interval_join`` — intervals
    explode to the (≤2) two-hour bins they cover, points map to
    exactly one bin, and the match is a shuffle hash join on the bin
    key with the range predicate as a residual filter. The oracle is
    the plain theta join, proving the binned plan loses nothing.
    """
    from tpg_weather_etl_spark.operators.ranges import interval_join

    e = t(spark, sf_dir, "events")
    iv = (
        e.filter((F.col("event_type") == "purchase")
                 & (F.col("value") > 99.0))
        .select(
            F.col("event_id").alias("window_id"),
            F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr(f"interval {IVJOIN_WINDOW_H} hours"))
            .alias("w_end"),
        )
    )
    pts = e.select(F.col("ts").alias("p_ts"), F.col("value").alias("p_val"))
    joined = interval_join(
        pts, iv, "p_ts", "w_start", "w_end",
        bin_seconds=IVJOIN_WINDOW_H * 3600,
    )
    return joined.groupBy("window_id", "w_start").agg(
        F.count(F.lit(1)).alias("n_events"),
        _dsum(F.col("p_val")).alias("value_sum"),
    )


SQL_INTERVAL_JOIN = """
WITH iv AS (
  SELECT event_id AS window_id, ts AS w_start,
         ts + INTERVAL 2 HOUR AS w_end
  FROM events WHERE event_type = 'purchase' AND value > 99.0)
SELECT iv.window_id, iv.w_start, COUNT(*) AS n_events,
  CAST(CAST(ROUND(SUM(CAST(e.value AS DECIMAL(24,8))), 4)
       AS DECIMAL(18,4)) AS DOUBLE) AS value_sum
FROM iv JOIN events e ON e.ts >= iv.w_start AND e.ts < iv.w_end
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Two-level aggregation distribution (TPC-H Q13 shape): aggregate of
# an aggregate, keeping empty groups through a left join
# ---------------------------------------------------------------------------

def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer distribution by order count — including zero-order
    customers, which only survive because the per-customer count runs
    over a LEFT join (the classic Q13 trap: an inner join silently
    drops the biggest histogram bucket).

    Scale shape: one co-partitioned left join + two hash aggs, the
    second over at most (distinct order counts) rows.
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count(F.col("o_orderkey")).alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


SQL_ORDER_COUNT_DISTRIBUTION = """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS n_orders
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY 1)
SELECT n_orders, COUNT(*) AS n_customers
FROM per_cust GROUP BY 1
"""


# ---------------------------------------------------------------------------
# HAVING-subquery join-back (TPC-H Q18 shape): large-quantity orders
# ---------------------------------------------------------------------------

BIG_ORDER_QTY = 210


def q_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total lineitem quantity exceeds a threshold,
    joined back for order payload — the aggregate-filter-then-join
    composition (HAVING subquery in SQL).

    Scale shape: the qualifying-key set is the output of a HAVING agg
    (tiny), so the join back to orders broadcasts at runtime; the
    lineitem table is aggregated once, never re-scanned.
    """
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    big = (
        l.groupBy("l_orderkey")
        .agg(_dsum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > BIG_ORDER_QTY)
    )
    return (
        o.join(big, o["o_orderkey"] == big["l_orderkey"])
        .select("o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


SQL_BIG_ORDERS = f"""
SELECT o_orderkey, o_orderdate, o_totalprice, total_qty
FROM orders
JOIN (SELECT l_orderkey,
        CAST(CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(24,8))), 4)
             AS DECIMAL(18,4)) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY 1
      HAVING total_qty > {BIG_ORDER_QTY}) b
  ON o_orderkey = b.l_orderkey
"""


# ---------------------------------------------------------------------------
# Salted join under the gate: the skew-mitigation operator must be
# invisible in results — oracle is the PLAIN join
# ---------------------------------------------------------------------------

def q_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority computed through
    ``operators.skew.salted_join`` (events-scale lineitem side salted,
    orders side replicated per salt) — the value-hash oracle is the
    UNSALTED join, proving salting changes the shuffle layout and
    nothing else. The one operator class where correctness means
    "identical to not using it".
    """
    from tpg_weather_etl_spark.operators.skew import salted_join

    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice",
                                            "l_discount")
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    joined = salted_join(l, o, ["l_orderkey"], salt_buckets=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .alias("revenue"),
    )


SQL_SALTED_JOIN_REVENUE = """
SELECT o_orderpriority, COUNT(*) AS n_items,
  CAST(CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
       AS DECIMAL(24,8))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Correlated per-group threshold (TPC-H Q17 shape): rows below a
# fraction of their own group's average
# ---------------------------------------------------------------------------

def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue locked in small orders: lineitems whose quantity is
    under 50% of their part's average quantity — the correlated
    scalar-subquery shape, decorrelated the way Catalyst itself does
    it: compute per-part averages once, join back, filter.

    The per-part threshold uses the decimal-exact average (rounded 6)
    so the comparison predicate lands identically in both engines.
    Scale shape: one map-side-combined agg over lineitem, one
    co-partitioned join on partkey, one global sum.
    """
    l = t(spark, sf_dir, "lineitem")
    per_part = l.groupBy("l_partkey").agg(
        (F.round(F.sum(F.col("l_quantity").cast("decimal(24,8)"))
                 .cast("double") / F.count("l_quantity"), 6))
        .alias("avg_qty")
    )
    return (
        l.join(per_part, "l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            _dsum(F.col("l_extendedprice")).alias("small_revenue"),
        )
    )


SQL_SMALL_QUANTITY_REVENUE = """
WITH per_part AS (
  SELECT l_partkey,
    round(CAST(SUM(CAST(l_quantity AS DECIMAL(24,8))) AS DOUBLE)
          / COUNT(l_quantity), 6) AS avg_qty
  FROM lineitem GROUP BY 1)
SELECT COUNT(*) AS n_small,
  CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,8))), 4)
       AS DECIMAL(18,4)) AS DOUBLE) AS small_revenue
FROM lineitem JOIN per_part USING (l_partkey)
WHERE l_quantity < 0.5 * avg_qty
"""


# ---------------------------------------------------------------------------
# spark.sql surface: the same engine through SQL text + temp views —
# one dialect-portable statement runs verbatim on Spark AND DuckDB
# ---------------------------------------------------------------------------

SQL_API_STATEMENT = """
SELECT o.o_orderpriority AS priority,
  COUNT(*) AS n_orders,
  CAST(CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(24,8))), 4)
       AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
  MIN(o.o_orderdate) AS first_order,
  MAX(o.o_orderdate) AS last_order
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_quantity >= 45)
GROUP BY o.o_orderpriority
"""


def q_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each nation's share of its region's revenue and of the grand
    total — the RATIO_TO_REPORT pattern: window sums over an ALREADY
    AGGREGATED table. The two windows (per-region, global) run over
    the nation-count-sized aggregate, so the "unpartitioned window"
    is bounded by the dimension, not the fact table — the one place
    that plan shape is legitimate, called out explicitly because
    everywhere else this repo replaces it with the two-level prefix
    operators.

    Shares are ratios of decimal-exact revenues rounded to 6.
    """
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    rev = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue")))
    w_reg = Window.partitionBy("r_name")
    w_all = Window.partitionBy()

    def wsum(w):
        # window sums routed through decimal: a double window-sum is
        # summation-order-dependent and the engines order differently
        return (F.sum(F.col("revenue").cast("decimal(24,8)"))
                .over(w).cast("double"))

    return rev.select(
        "r_name", "n_name", "revenue",
        (F.round(F.col("revenue") / wsum(w_reg), 6) + F.lit(0.0))
        .alias("region_share"),
        (F.round(F.col("revenue") / wsum(w_all), 6) + F.lit(0.0))
        .alias("global_share"))


SQL_REVENUE_SHARE = """
WITH rev AS (
  SELECT r_name, n_name,
    CAST(CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
         AS DECIMAL(24,8))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2)
SELECT r_name, n_name, revenue,
  round(revenue / CAST(SUM(CAST(revenue AS DECIMAL(24,8)))
                       OVER (PARTITION BY r_name) AS DOUBLE), 6)
    + 0.0 AS region_share,
  round(revenue / CAST(SUM(CAST(revenue AS DECIMAL(24,8)))
                       OVER () AS DOUBLE), 6) + 0.0 AS global_share
FROM rev
"""


SQL_LATERAL_TOP_ITEMS = """
SELECT o.o_orderkey, li.l_linenumber, li.l_extendedprice
FROM orders o,
LATERAL (SELECT l_linenumber, l_extendedprice
         FROM lineitem
         WHERE l_orderkey = o.o_orderkey
         ORDER BY l_extendedprice DESC, l_linenumber ASC
         LIMIT 3) li
WHERE o.o_totalprice > 450000
"""


def q_lateral_top_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL derived table with ORDER BY + LIMIT — the
    per-row top-k join shape SQL users reach for before discovering
    window functions. Catalyst decorrelates it into a join +
    per-group limit; the dialect-portable statement runs verbatim on
    both engines (the text IS the oracle), proving the lateral
    decorrelation agrees with DuckDB's.

    Deterministic: the inner ORDER BY carries the linenumber
    tiebreak, so the LIMIT boundary can't flap.
    """
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(SQL_LATERAL_TOP_ITEMS)


def q_sql_api_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-text front door: register temp views, run one
    dialect-portable statement (correlated EXISTS → Catalyst plans a
    left-semi join; the identical text IS the oracle). Everything
    else in the gate uses the DataFrame API — this proves a SQL user
    gets the same engine.
    """
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(SQL_API_STATEMENT)


# ---------------------------------------------------------------------------
# Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
# match each other instead of vanishing — the semantics dimension
# tables with optional keys need
# ---------------------------------------------------------------------------

def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate events by a nullable derived group (k%5, NULL when
    the JSON field is absent-or-zero), then enrich each group from a
    reference frame through ``eqNullSafe`` — the NULL group survives
    the join and carries its label, which a plain equi-join would
    silently drop.

    Scale shape: identical to an ordinary equi-join (hash on the key
    with NULL as a regular value) — ``<=>`` only changes comparison
    semantics, not the shuffle.
    """
    e = t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    grouped = (
        e.withColumn("g", F.nullif(k % 5, F.lit(0)))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"),
             _dsum(F.col("value")).alias("value_sum"))
    )
    labels = spark.createDataFrame(
        [(None, "missing-or-zero"), (1, "one"), (2, "two"),
         (3, "three"), (4, "four")],
        "g int, label string",
    )
    return grouped.join(
        F.broadcast(labels),
        grouped["g"].eqNullSafe(labels["g"]),
    ).select(grouped["g"].alias("g"), "label", "n", "value_sum")


SQL_NULL_SAFE_JOIN = """
WITH grouped AS (
  SELECT nullif(CAST(json_extract_string(props, '$.k') AS INTEGER) % 5, 0)
           AS g,
         COUNT(*) AS n,
         CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(24,8))), 4)
              AS DECIMAL(18,4)) AS DOUBLE) AS value_sum
  FROM events GROUP BY 1),
labels(g, label) AS (VALUES (NULL, 'missing-or-zero'), (1, 'one'),
                            (2, 'two'), (3, 'three'), (4, 'four'))
SELECT CAST(grouped.g AS INTEGER) AS g, label, n, value_sum
FROM grouped JOIN labels ON grouped.g IS NOT DISTINCT FROM labels.g
"""


# ---------------------------------------------------------------------------
# Snapshot diff / reconciliation: added-removed-changed report between
# two table versions via one full-outer join on the key
# ---------------------------------------------------------------------------

def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconcile two deterministic snapshots of the events table (the
    'v2' snapshot drops error events and revalues clicks) into the
    classic added/removed/changed/unchanged counts per event type.

    One full-outer join on the key, status derived from null-ness and
    value comparison, one small agg — the table-diff every migration
    and backfill validation runs. At scale both sides co-partition on
    the key; nothing is collected.
    """
    e = t(spark, sf_dir, "events")
    v1 = e.select("event_id", "event_type", "value")
    v2 = (
        e.filter(F.col("event_type") != "error")
        .select(
            "event_id", "event_type",
            F.when(F.col("event_type") == "click", F.col("value") * 2)
            .otherwise(F.col("value")).alias("value"),
        )
    )
    a, b = v1.alias("a"), v2.alias("b")
    joined = a.join(b, F.col("a.event_id") == F.col("b.event_id"), "full")
    status = (
        F.when(F.col("b.event_id").isNull(), "removed")
        .when(F.col("a.event_id").isNull(), "added")
        .when(F.col("a.value") != F.col("b.value"), "changed")
        .otherwise("unchanged")
    )
    return (
        joined.select(
            F.coalesce(F.col("a.event_type"), F.col("b.event_type"))
            .alias("event_type"),
            status.alias("status"),
        )
        .groupBy("event_type", "status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_SNAPSHOT_DIFF = """
WITH v1 AS (SELECT event_id, event_type, value FROM events),
v2 AS (SELECT event_id, event_type,
         CASE WHEN event_type = 'click' THEN value * 2 ELSE value END AS value
       FROM events WHERE event_type != 'error')
SELECT coalesce(a.event_type, b.event_type) AS event_type,
  CASE WHEN b.event_id IS NULL THEN 'removed'
       WHEN a.event_id IS NULL THEN 'added'
       WHEN a.value != b.value THEN 'changed'
       ELSE 'unchanged' END AS status,
  COUNT(*) AS n
FROM v1 a FULL OUTER JOIN v2 b ON a.event_id = b.event_id
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Constraint validation: dbt-test-style expectations (unique key,
# not-null, value range, referential integrity) in one report
# ---------------------------------------------------------------------------

def q_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per declared constraint with its violation count —
    unique(event_id), not_null(user_id), range(value ∈ [0, 1000]),
    and FK events.user_id → customer.c_custkey.

    Scale shape: the unique check is one count-distinct agg, the FK
    check a left-anti join against the (broadcastable) key side,
    scalar checks are map-side conditional sums; the report unions
    four 1-row frames.
    """
    e = t(spark, sf_dir, "events")
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"))

    def one(name: str, cnt: DataFrame) -> DataFrame:
        return cnt.select(F.lit(name).alias("constraint"),
                          F.col("violations").cast("long")
                          .alias("violations"))

    uniq = e.agg(
        (F.count(F.lit(1)) - F.count_distinct(F.col("event_id")))
        .alias("violations"))
    notnull = e.agg(
        F.sum(F.col("user_id").isNull().cast("int")).alias("violations"))
    rng = e.agg(
        F.sum((~F.col("value").between(0.0, 1000.0)).cast("int"))
        .alias("violations"))
    fk = (
        e.select("user_id").join(c, "user_id", "left_anti")
        .agg(F.count(F.lit(1)).alias("violations"))
    )
    return (
        one("unique_event_id", uniq)
        .unionByName(one("not_null_user_id", notnull))
        .unionByName(one("value_in_range", rng))
        .unionByName(one("fk_user_id_customer", fk))
    )


SQL_CONSTRAINT_REPORT = """
SELECT 'unique_event_id' AS constraint,
       COUNT(*) - COUNT(DISTINCT event_id) AS violations FROM events
UNION ALL
SELECT 'not_null_user_id',
       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM events
UNION ALL
SELECT 'value_in_range',
       CAST(SUM(CASE WHEN value NOT BETWEEN 0.0 AND 1000.0
                THEN 1 ELSE 0 END) AS BIGINT) FROM events
UNION ALL
SELECT 'fk_user_id_customer', COUNT(*) FROM events e
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
"""


# ---------------------------------------------------------------------------
# Ranking-function family: rank / dense_rank / percent_rank /
# cume_dist / ntile in one window pass
# ---------------------------------------------------------------------------

def q_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every SQL ranking function over one (event_type, value-ordered)
    window — all five share a single sort/shuffle; ties are broken by
    event_id so every rank is total-order deterministic. Ratios round
    to 6 (exact small-int divisions, but the guard costs nothing).
    """
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return e.select(
        "event_id", "event_type",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        (F.round(F.percent_rank().over(w), 6) + 0.0).alias("prnk"),
        (F.round(F.cume_dist().over(w), 6) + 0.0).alias("cdist"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


SQL_RANK_FUNCTIONS = """
SELECT event_id, event_type,
  rank() OVER w AS rnk,
  dense_rank() OVER w AS drnk,
  round(percent_rank() OVER w, 6) + 0.0 AS prnk,
  round(cume_dist() OVER w, 6) + 0.0 AS cdist,
  ntile(4) OVER w AS quartile
FROM events WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
"""


# ---------------------------------------------------------------------------
# Edit-distance fuzzy matching: levenshtein self-join over a distinct
# key vocabulary (the fuzzy-key-reconciliation primitive; at scale the
# distinct vocab is small relative to the corpus, so the quadratic
# stays on the dictionary, never on the data)
# ---------------------------------------------------------------------------

def q_fuzzy_match_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-name pairs within levenshtein distance 1 (e.g. 'src1' ~
    'src2') — the dictionary-level fuzzy join: dedupe the key column
    first (20 rows), pair the dictionary, map matches back by exact
    join if needed. The corpus never enters the quadratic.
    """
    s = (
        t(spark, sf_dir, "documents").select("source").distinct()
    )
    a = s.select(F.col("source").alias("src_a"))
    b = s.select(F.col("source").alias("src_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("src_a") < F.col("src_b"))
        .select(
            "src_a", "src_b",
            F.levenshtein(F.col("src_a"), F.col("src_b")).cast("long")
            .alias("dist"),
        )
        .filter(F.col("dist") <= 1)
    )


SQL_FUZZY_MATCH_SOURCES = """
WITH s AS (SELECT DISTINCT source FROM documents)
SELECT a.source AS src_a, b.source AS src_b,
  CAST(levenshtein(a.source, b.source) AS BIGINT) AS dist
FROM s a JOIN s b ON a.source < b.source
WHERE levenshtein(a.source, b.source) <= 1
"""


# ---------------------------------------------------------------------------
# Set operations: INTERSECT / EXCEPT (§2.7 beyond UNION ALL)
# ---------------------------------------------------------------------------

def q_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users with a high-value click AND a high-value purchase but no
    high-value error — ``intersect`` then ``except`` (both distinct
    set semantics, matching SQL INTERSECT/EXCEPT; the value filter
    keeps all three branches and the result non-trivially populated).

    Scale shape: Spark plans set ops as aggregates/joins on the
    projected key only — three single-column shuffles, no corpus
    payload movement.
    """
    e = t(spark, sf_dir, "events")
    users = lambda et: (
        e.filter((F.col("event_type") == et) & (F.col("value") > 95.0))
        .select("user_id")
    )
    return (
        users("click").intersect(users("purchase"))
        .exceptAll(users("error").distinct())
    )


SQL_INTERSECT_EXCEPT = """
(SELECT user_id FROM events WHERE event_type = 'click' AND value > 95.0
 INTERSECT
 SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 95.0)
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error' AND value > 95.0
"""


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive multi-attribute predicate across a join
# (OR-of-ANDs referencing BOTH sides). The optimizer lesson: each
# side's implied common conjunct is stated explicitly so it pushes to
# the scan (p_brand IN-list on part, l_quantity range on lineitem) —
# the disjunction itself can only be evaluated after the join.
# ---------------------------------------------------------------------------

_Q19_BRANDS = ("Brand#12", "Brand#23", "Brand#3")


def q_disjunctive_pred_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(
        F.col("p_brand").isin(*_Q19_BRANDS)  # implied by the disjunction
    )
    l = t(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(1.0, 30.0)  # implied; pushes to scan
    )
    cond = (
        ((F.col("p_brand") == "Brand#12")
         & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1.0, 11.0))
        | ((F.col("p_brand") == "Brand#23")
           & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10.0, 20.0))
        | ((F.col("p_brand") == "Brand#3")
           & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20.0, 30.0))
    )
    return (
        # part is a dim (constant per-SF ratio) — broadcast kills the
        # shuffle; the residual disjunction evaluates post-join
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("revenue"),
        )
    )


SQL_DISJUNCTIVE_PRED_REVENUE = """
SELECT COUNT(*) AS n_items,
  CAST(CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(24,8))), 4)
       AS DECIMAL(18,4)) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: scalar-subquery threshold + windowed NOT EXISTS
# anti-join ("above-average-balance customers with no recent orders").
# ---------------------------------------------------------------------------

IDLE_CUTOFF = "2000-01-01"


def q_idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    recent = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(IDLE_CUTOFF).cast("timestamp")
    ).select("o_custkey")
    # exact, order-independent average: DECIMAL(24,8) sum → double / count
    # (same contract as _davg) so both engines compare against the
    # bit-identical threshold — no FP knife edge in the > filter
    ab = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(24,8)")).cast("double")
         / F.count("c_acctbal")).alias("ab")
    )
    return (
        c.join(F.broadcast(ab))            # 1-row scalar: broadcast CROSS
        .filter(F.col("c_acctbal") > F.col("ab"))
        # date filter pushes to the orders scan; the anti-join then
        # co-partitions on custkey (AQE broadcasts the reduced side
        # when the window makes it small)
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            _dsum(F.col("c_acctbal")).alias("total_bal"),
        )
    )


SQL_IDLE_CUSTOMER_BALANCE = f"""
WITH ab AS (SELECT SUM(CAST(c_acctbal AS DECIMAL(24,8)))::DOUBLE
                   / COUNT(c_acctbal) AS ab
            FROM customer WHERE c_acctbal > 0.0)
SELECT c_mktsegment, COUNT(*) AS n_cust,
  CAST(CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(24,8))), 4)
       AS DECIMAL(18,4)) AS DOUBLE) AS total_bal
FROM customer CROSS JOIN ab
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = customer.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{IDLE_CUTOFF}')
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: conditional-aggregate ratio over a month window
# ("promo revenue percentage").
# ---------------------------------------------------------------------------

PROMO_MONTH = ("1997-09-01", "1997-10-01")


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(PROMO_MONTH[0]).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(PROMO_MONTH[1]).cast("timestamp"))
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            _dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            .alias("promo_revenue"),
            _dsum(rev).alias("total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue", "total_revenue",
        (F.round(F.lit(100.0) * F.col("promo_revenue")
                 / F.col("total_revenue"), 6) + F.lit(0.0))
        .alias("promo_pct"),
    )


SQL_PROMO_REVENUE = f"""
WITH agg AS (
  SELECT
    CAST(CAST(ROUND(SUM(CAST(CASE WHEN p_type = 'PROMO'
          THEN l_extendedprice*(1-l_discount) ELSE 0.0 END
          AS DECIMAL(24,8))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS promo_revenue,
    CAST(CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount)
          AS DECIMAL(24,8))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS total_revenue
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE l_shipdate >= TIMESTAMP '{PROMO_MONTH[0]}'
    AND l_shipdate < TIMESTAMP '{PROMO_MONTH[1]}')
SELECT promo_revenue, total_revenue,
  round(100.0 * promo_revenue / total_revenue, 6) + 0.0 AS promo_pct
FROM agg
"""


# ---------------------------------------------------------------------------
# CUBE grouping sets — all four aggregation levels of
# (event_type × day-of-week) in one Expand + one hash aggregate.
# Complements rollup_revenue (hierarchical levels only).
# ---------------------------------------------------------------------------

def q_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value totals for every subset of {event_type, dow} — one Expand
    (×4 rows) into one map-side-combining hash agg, never a re-scan
    per level. gid uses the same GROUPING bitmask in both engines
    (detail=0, per-type=1, per-dow=2, grand=3)."""
    from tpg_weather_etl_spark.functions.time import dow_monday0

    e = t(spark, sf_dir, "events").select(
        "event_type", dow_monday0(F.col("ts")).alias("dow"), "value"
    )
    return (
        e.cube("event_type", "dow")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum(F.col("value")).alias("sum_value"),
            F.grouping_id().cast("int").alias("gid"),
        )
    )


SQL_CUBE_REVENUE = """
WITH b AS (SELECT event_type, (isodow(ts) - 1)::INT AS dow, value
           FROM events)
SELECT event_type, dow, COUNT(*) AS n_events,
  CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(24,8))), 4)
       AS DECIMAL(18,4)) AS DOUBLE) AS sum_value,
  GROUPING(event_type, dow)::INT AS gid
FROM b
GROUP BY CUBE(event_type, dow)
"""


# ---------------------------------------------------------------------------
# Nation-pair trade flow (TPC-H Q7 shape): two aliases of the same
# dimension in one star join + a pair-symmetric disjunction
# ---------------------------------------------------------------------------

# pair chosen to be non-empty at every test SF (sf0.001 upward)
VOLUME_NATIONS = ("NATION_12", "NATION_10")
VOLUME_YEARS = ("1996-01-01", "1998-01-01")


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue shipped between two nations, per direction per year —
    the Q7 shape: the nation dimension joins TWICE under different
    roles (supplier side, customer side), and the pair predicate is a
    symmetric disjunction that must not collapse the two aliases.

    Scale shape: nation is broadcast twice (25 rows); the only large
    shuffles are lineitem⋈orders on orderkey and ⋈customer on custkey.
    The supplier join is broadcast-sized at every SF ratio (supplier
    is 1/10th of customer in TPC-H). Each nation filter is pushed
    through its own alias BEFORE the fact joins, so at 100 TB only
    the two nations' suppliers/customers reach the shuffle."""
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"),
                  F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"),
                  F.col("n_name").alias("cust_nation"))
    a, b = VOLUME_NATIONS
    joined = (
        l.filter(
            (F.col("l_shipdate") >= F.lit(VOLUME_YEARS[0]).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(VOLUME_YEARS[1]).cast("timestamp")))
        .join(F.broadcast(
            s.join(F.broadcast(n1), s["s_nationkey"] == n1["s_nk"])
             .select("s_suppkey", "supp_nation")
             .filter(F.col("supp_nation").isin(a, b))),
            on=[F.col("l_suppkey") == F.col("s_suppkey")])
        .join(o, F.col("l_orderkey") == o["o_orderkey"])
        .join(c.join(F.broadcast(n2), c["c_nationkey"] == n2["c_nk"])
               .select("c_custkey", "cust_nation")
               .filter(F.col("cust_nation").isin(a, b)),
              F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == a) & (F.col("cust_nation") == b))
            | ((F.col("supp_nation") == b) & (F.col("cust_nation") == a)))
    )
    return (
        joined.groupBy("supp_nation", "cust_nation",
                       F.year("l_shipdate").alias("l_year"))
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
    )


SQL_VOLUME_SHIPPING = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  CAST(year(l_shipdate) AS INT) AS l_year,
  CAST(CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
       AS DECIMAL(24,8))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE l_shipdate >= TIMESTAMP '{VOLUME_YEARS[0]}'
  AND l_shipdate <  TIMESTAMP '{VOLUME_YEARS[1]}'
  AND ((n1.n_name = '{VOLUME_NATIONS[0]}' AND n2.n_name = '{VOLUME_NATIONS[1]}')
    OR (n1.n_name = '{VOLUME_NATIONS[1]}' AND n2.n_name = '{VOLUME_NATIONS[0]}'))
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Conditional-share ratio (TPC-H Q8 shape): one nation's share of a
# region's revenue in a part segment, per year
# ---------------------------------------------------------------------------

SHARE_NATION = "NATION_5"
SHARE_REGION = "EUROPE"
SHARE_PTYPE = "PROMO"


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One nation's share of PROMO-part revenue sold into one region,
    per year — the Q8 shape: a five-table star where the numerator is
    a conditional sum over the SAME joined rows as the denominator
    (one pass, no second scan), and the grouping key is derived
    (year) rather than stored.

    Scale shape: part is filtered to one p_type before the join (the
    most selective predicate reaches its scan); supplier→nation gives
    the numerator flag via one broadcast; customer→nation→region
    restricts the denominator rows. lineitem is scanned once."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == SHARE_PTYPE)
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == SHARE_REGION)
    cust_in_region = (
        c.join(F.broadcast(
            n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
             .select("n_nationkey")),
            c["c_nationkey"] == F.col("n_nationkey"))
        .select("c_custkey"))
    supp_nation = (
        s.join(F.broadcast(n.select(F.col("n_nationkey").alias("snk"),
                                    F.col("n_name").alias("supp_nation"))),
               s["s_nationkey"] == F.col("snk"))
        .select("s_suppkey", "supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        l.join(F.broadcast(p.select("p_partkey")),
               l["l_partkey"] == F.col("p_partkey"))
        .join(F.broadcast(supp_nation),
              l["l_suppkey"] == F.col("s_suppkey"))
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(cust_in_region, o["o_custkey"] == F.col("c_custkey"),
              "left_semi")
        .select(F.year("o_orderdate").alias("o_year"),
                vol.alias("volume"), "supp_nation")
    )
    agg = joined.groupBy("o_year").agg(
        _dsum(F.when(F.col("supp_nation") == SHARE_NATION,
                     F.col("volume")).otherwise(F.lit(0.0)))
        .alias("nation_volume"),
        _dsum(F.col("volume")).alias("total_volume"),
    )
    return agg.select(
        "o_year", "nation_volume", "total_volume",
        (F.round(F.col("nation_volume") / F.col("total_volume"), 6)
         + F.lit(0.0)).alias("mkt_share"),
    )


SQL_MARKET_SHARE = f"""
WITH joined AS (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n1.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = n2.n_regionkey
  WHERE p_type = '{SHARE_PTYPE}' AND r_name = '{SHARE_REGION}')
SELECT o_year,
  CAST(CAST(ROUND(SUM(CAST(CASE WHEN supp_nation = '{SHARE_NATION}'
       THEN volume ELSE 0.0 END AS DECIMAL(24,8))), 4)
       AS DECIMAL(18,4)) AS DOUBLE) AS nation_volume,
  CAST(CAST(ROUND(SUM(CAST(volume AS DECIMAL(24,8))), 4)
       AS DECIMAL(18,4)) AS DOUBLE) AS total_volume,
  round(CAST(CAST(ROUND(SUM(CAST(CASE WHEN supp_nation = '{SHARE_NATION}'
       THEN volume ELSE 0.0 END AS DECIMAL(24,8))), 4)
       AS DECIMAL(18,4)) AS DOUBLE)
     / CAST(CAST(ROUND(SUM(CAST(volume AS DECIMAL(24,8))), 4)
       AS DECIMAL(18,4)) AS DOUBLE), 6) + 0.0 AS mkt_share
FROM joined GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Returned-item top customers (TPC-H Q10 shape): quarter-windowed
# revenue ranking with a deterministic top-20
# ---------------------------------------------------------------------------

RETURN_QUARTER = ("1997-01-01", "1997-04-01")


def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 20 customers by revenue lost to returns in one quarter —
    the Q10 shape: a selective fact-side predicate (returnflag +
    quarter), customer payload join AFTER the aggregation so only 20
    rows fetch their enrichment columns, nation broadcast.

    Determinism: ties broken by c_custkey so the LIMIT set is unique
    in both engines. Scale shape: the orders quarter filter prunes
    before the lineitem join; the post-agg top-k is
    TakeOrderedAndProject (no global sort)."""
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(RETURN_QUARTER[0]).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(RETURN_QUARTER[1]).cast("timestamp")))
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    per_cust = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_custkey"))
        .limit(20)
    )
    return (
        per_cust.join(c, per_cust["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select(F.col("c_custkey"), "c_name", "c_acctbal",
                F.col("n_name").alias("nation"), "revenue")
    )


SQL_RETURNED_ITEMS = f"""
WITH per_cust AS (
  SELECT o_custkey,
    CAST(CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
         AS DECIMAL(24,8))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '{RETURN_QUARTER[0]}'
    AND o_orderdate <  TIMESTAMP '{RETURN_QUARTER[1]}'
  GROUP BY 1
  ORDER BY revenue DESC, o_custkey
  LIMIT 20)
SELECT c_custkey, c_name, c_acctbal, n_name AS nation, revenue
FROM per_cust
JOIN customer ON c_custkey = o_custkey
JOIN nation   ON n_nationkey = c_nationkey
"""


# ---------------------------------------------------------------------------
# Top supplier by scalar-subquery max (TPC-H Q15 shape)
# ---------------------------------------------------------------------------

TOP_SUPPLIER_WINDOW = ("1997-01-01", "1997-04-01")


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) whose quarterly revenue equals the global maximum —
    the Q15 shape: an aggregate compared against a scalar aggregate
    OF ITSELF. Decorrelated Spark-side as: aggregate once, reduce the
    1-row max, broadcast it back as an equi-ish filter join. The
    revenue is decimal-exact in both engines, so the equality
    predicate is safe cross-engine (the reason Q15 is notoriously
    flaky on floats).

    Scale shape: one lineitem agg (map-side combined), one 1-row
    broadcast; no window over an unpartitioned set."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(TOP_SUPPLIER_WINDOW[0]).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(TOP_SUPPLIER_WINDOW[1]).cast("timestamp")))
    s = t(spark, sf_dir, "supplier")
    rev = l.groupBy("l_suppkey").agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .alias("total_rev"))
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev["total_rev"] == mx["mx"])
        .join(s, rev["l_suppkey"] == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_rev")
    )


SQL_TOP_SUPPLIER = f"""
WITH rev AS (
  SELECT l_suppkey,
    CAST(CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
         AS DECIMAL(24,8))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{TOP_SUPPLIER_WINDOW[0]}'
    AND l_shipdate <  TIMESTAMP '{TOP_SUPPLIER_WINDOW[1]}'
  GROUP BY 1)
SELECT s_suppkey, s_name, total_rev
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
"""


# ---------------------------------------------------------------------------
# EXISTS with residual non-equi predicate (TPC-H Q4 shape, adapted to
# the available columns: "shipped late" instead of commit/receipt)
# ---------------------------------------------------------------------------

LATE_ORDER_WINDOW = ("1997-01-01", "1997-07-01")


def q_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts per priority where at least one lineitem shipped
    more than 30 days after the order date — the Q4 shape: EXISTS
    with a correlated NON-EQUI residual (l_shipdate > o_orderdate +
    30d) on top of the orderkey equi-condition, planned as a
    left-semi hash join with the residual evaluated post-probe.

    Scale shape: the semi join deduplicates matches before the agg
    (no COUNT(DISTINCT)); the orders window predicate prunes the
    probe side first."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(LATE_ORDER_WINDOW[0]).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(LATE_ORDER_WINDOW[1]).cast("timestamp")))
    l = t(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (o["o_orderkey"] == l["l_orderkey"])
        & (l["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 30 DAYS")),
        "left_semi")
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"))


SQL_PRIORITY_LATE_ORDERS = f"""
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '{LATE_ORDER_WINDOW[0]}'
  AND o_orderdate <  TIMESTAMP '{LATE_ORDER_WINDOW[1]}'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# UNPIVOT (melt): wide metric columns → long (metric, value) rows —
# the inverse of pivot_event_values
# ---------------------------------------------------------------------------

def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly wide metrics (sum_qty / sum_price / n_rows as columns)
    melted to long (month, metric, value) form via DataFrame.unpivot —
    the reshape that feeds metric-agnostic dashboards and alerting.

    Scale shape: the unpivot is a zero-shuffle Expand (×3 rows) over
    the already-aggregated month-sized table; the only shuffle is the
    upstream month agg, map-side combined."""
    l = t(spark, sf_dir, "lineitem")
    wide = l.groupBy(month_key(F.col("l_shipdate")).alias("month")).agg(
        _dsum(F.col("l_quantity")).alias("sum_qty"),
        _dsum(F.col("l_extendedprice")).alias("sum_price"),
        F.count(F.lit(1)).cast("double").alias("n_rows"),
    )
    return wide.unpivot(
        ["month"], ["sum_qty", "sum_price", "n_rows"], "metric", "value")


SQL_UNPIVOT_METRICS = """
WITH wide AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS month,
    CAST(CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(24,8))), 4)
         AS DECIMAL(18,4)) AS DOUBLE) AS sum_qty,
    CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,8))), 4)
         AS DECIMAL(18,4)) AS DOUBLE) AS sum_price,
    CAST(COUNT(*) AS DOUBLE) AS n_rows
  FROM lineitem GROUP BY 1)
SELECT month, 'sum_qty' AS metric, sum_qty AS value FROM wide
UNION ALL
SELECT month, 'sum_price' AS metric, sum_price AS value FROM wide
UNION ALL
SELECT month, 'n_rows' AS metric, n_rows AS value FROM wide
"""


# ---------------------------------------------------------------------------
# Correlated per-group minimum join-back (TPC-H Q2 shape, adapted:
# unit cost derived from lineitem instead of the absent partsupp)
# ---------------------------------------------------------------------------

MIN_COST_PART_TYPE = "LARGE"
MIN_COST_MIN_SIZE = 45


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each qualifying part, the supplier(s) offering its minimum
    unit cost — the Q2 shape: a correlated scalar-MIN subquery over the
    (part, supplier) cost relation. Decorrelated Spark-side as ONE
    grouped agg plus a per-part window-min filter, so the cost relation
    is shuffled once on its own grouping key and never joined back to
    itself.

    Unit cost is a double division: IEEE-exact and identical in both
    engines, so the MIN-equality predicate is safe (same reason the
    as-of joins can compare doubles). The part filter is applied BEFORE
    the lineitem join and broadcast, so at 100 TB the fact scan is
    pruned by a build-side bloom/DPP, not post-filtered.

    Oracle: the textbook correlated-subquery formulation — an
    independent derivation of the same rows.
    """
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_type") == MIN_COST_PART_TYPE)
        & (F.col("p_size") >= MIN_COST_MIN_SIZE))
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    cost = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy("p_partkey", "p_name", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
             .alias("unit_cost"))
    )
    w = Window.partitionBy("p_partkey")
    best = (cost.withColumn("best", F.min("unit_cost").over(w))
            .filter(F.col("unit_cost") == F.col("best")))
    return (
        best.join(F.broadcast(s), best["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select("p_partkey", "p_name", "s_name", "n_name", "unit_cost")
    )


SQL_MIN_COST_SUPPLIER = f"""
WITH cost AS (
  SELECT p_partkey, p_name, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = '{MIN_COST_PART_TYPE}' AND p_size >= {MIN_COST_MIN_SIZE}
  GROUP BY 1, 2, 3)
SELECT p_partkey, p_name, s_name, n_name, unit_cost
FROM cost c JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE unit_cost = (SELECT MIN(c2.unit_cost) FROM cost c2
                   WHERE c2.p_partkey = c.p_partkey)
"""


# ---------------------------------------------------------------------------
# Multi-dimension star join with derived profit (TPC-H Q9 shape,
# adapted: cost proxy from p_retailprice instead of absent partsupp)
# ---------------------------------------------------------------------------

PROFIT_NAME_FRAGMENT = "bolt"


def q_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit per (supplier nation, order year) for parts whose name
    contains a fragment — the Q9 shape: a four-dimension star join
    (part, supplier, nation broadcast; orders the one real shuffle)
    with a derived measure aggregated by attributes of two different
    dimensions.

    amount = revenue − 1% of retail-price-based cost; the expression
    tree is written identically in both engines (left-associated
    products) so the doubles entering the decimal-exact sum are
    bit-identical.
    """
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        F.col("p_name").contains(PROFIT_NAME_FRAGMENT))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.01) * F.col("p_retailprice") * F.col("l_quantity"))
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(_dsum(amount).alias("sum_profit"))
    )


SQL_PROFIT_BY_NATION_YEAR = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
       CAST(CAST(ROUND(SUM(CAST(
         l_extendedprice * (1 - l_discount)
         - 0.01 * p_retailprice * l_quantity AS DECIMAL(24,8))), 4)
         AS DECIMAL(18,4)) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%{PROFIT_NAME_FRAGMENT}%'
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Aggregate filtered by a fraction of its own grand total (TPC-H Q11
# shape: the HAVING > scalar-subquery threshold)
# ---------------------------------------------------------------------------

IMPORTANT_AVG_MULTIPLE = 1.5


def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose total traded value exceeds 1.5× the AVERAGE
    per-part value — the Q11 shape: a grouped aggregate compared
    against a scalar aggregate of itself. Decorrelated as: aggregate
    once, reduce the 1-row (total, count), broadcast it back as a
    filter. Both sums are decimal-exact, and the threshold expression
    ((tot / n) * 1.5) is the same IEEE double tree in both engines,
    so the > comparison can't straddle an ulp.

    The threshold is a multiple of the MEAN, not a fixed fraction of
    the grand total, so selectivity is scale-invariant (a fixed
    fraction selects everything at small part counts and nothing at
    large ones — the per-part share decays as 1/n).

    Scale shape: one map-side-combined lineitem agg; the scalar
    re-aggregates the (small) per-part relation, not the fact table.
    """
    l = t(spark, sf_dir, "lineitem")
    val = l.groupBy("l_partkey").agg(
        _dsum(F.col("l_extendedprice") * F.col("l_quantity"))
        .alias("part_value"))
    tot = val.agg(
        F.sum(F.col("part_value").cast("decimal(24,8)"))
        .cast("double").alias("tot"),
        F.count("*").alias("n"))
    return (
        val.join(F.broadcast(tot))
        .filter(F.col("part_value")
                > (F.col("tot") / F.col("n"))
                * F.lit(IMPORTANT_AVG_MULTIPLE))
        .select("l_partkey", "part_value")
    )


SQL_IMPORTANT_PARTS = f"""
WITH val AS (
  SELECT l_partkey,
    CAST(CAST(ROUND(SUM(CAST(l_extendedprice * l_quantity
         AS DECIMAL(24,8))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS part_value
  FROM lineitem GROUP BY 1),
tot AS (
  SELECT CAST(SUM(CAST(part_value AS DECIMAL(24,8))) AS DOUBLE) AS tot,
         COUNT(*) AS n
  FROM val)
SELECT l_partkey, part_value
FROM val, tot
WHERE part_value > (tot / n) * {IMPORTANT_AVG_MULTIPLE}
"""


# ---------------------------------------------------------------------------
# Distinct-count with NOT-IN exclusion (TPC-H Q16 shape)
# ---------------------------------------------------------------------------

SUPPLIER_CNT_SIZES = (1, 5, 9, 14, 19, 23, 36, 45)


def q_supplier_cnt_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier count per (brand, type, size) excluding a
    NOT-IN supplier set — the Q16 shape. The NOT IN becomes a
    broadcast left-anti join (the excluded set is tiny), and the
    DISTINCT count is an explicit two-level aggregate — dedupe on
    (group keys, suppkey) first, then count — so no COUNT(DISTINCT)
    expand ever shuffles the fact table twice.
    """
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(*SUPPLIER_CNT_SIZES)))
    excl = (t(spark, sf_dir, "supplier")
            .filter(F.col("s_name").like("%9"))
            .select("s_suppkey"))
    l = (t(spark, sf_dir, "lineitem")
         .join(F.broadcast(excl),
               F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"))
    pairs = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct())
    return (pairs.groupBy("p_brand", "p_type", "p_size")
            .agg(F.count("*").alias("supplier_cnt")))


SQL_SUPPLIER_CNT_BY_TYPE = f"""
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN {SUPPLIER_CNT_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_name LIKE '%9')
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# EXISTS + NOT-EXISTS self-correlation (TPC-H Q21 shape)
# ---------------------------------------------------------------------------

WAITING_LATE_DAYS = 30


def q_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per supplier, the number of finished multi-supplier orders where
    they were the ONLY late supplier — the Q21 shape (EXISTS another
    supplier on the order; NOT EXISTS another LATE supplier).

    Spark-side the double self-correlation collapses into ONE grouped
    pass over the order's lineitems: per order, count distinct
    suppliers, count distinct late suppliers, and keep the sole late
    supplier via MAX over the late branch. That replaces two
    shuffled self-semi/anti-joins of the fact table with a single
    orderkey shuffle — the difference between 1× and 3× fact-table
    traffic at 100 TB.

    Oracle: the textbook EXISTS / NOT EXISTS formulation — an
    independent derivation, so the gate also proves the
    decorrelation is semantics-preserving.
    """
    o = (t(spark, sf_dir, "orders")
         .filter(F.col("o_orderstatus") == "F")
         .select("o_orderkey", "o_orderdate"))
    l = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    j = l.join(o, l["l_orderkey"] == o["o_orderkey"])
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {WAITING_LATE_DAYS} DAYS")
    per_order = j.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(late, F.col("l_suppkey")))
        .alias("n_late_supp"),
        F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"))
    sole = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    res = sole.groupBy("late_supp").agg(F.count("*").alias("numwait"))
    s = t(spark, sf_dir, "supplier")
    return (res.join(F.broadcast(s),
                     res["late_supp"] == s["s_suppkey"])
            .select("s_name", "numwait"))


SQL_WAITING_ORDERS = f"""
WITH cand AS (
  SELECT DISTINCT l1.l_suppkey, l1.l_orderkey
  FROM lineitem l1 JOIN orders ON l1.l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l1.l_shipdate > o_orderdate + INTERVAL {WAITING_LATE_DAYS} DAY
    AND EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM lineitem l3
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey
                      AND l3.l_shipdate > o_orderdate
                          + INTERVAL {WAITING_LATE_DAYS} DAY))
SELECT s_name, COUNT(*) AS numwait
FROM cand JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
"""


# ---------------------------------------------------------------------------
# Distributed 2-D skyline (Pareto frontier) via the two-level prefix
# max — no single-partition window, no quadratic self-join
# ---------------------------------------------------------------------------

def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal parts: minimize p_retailprice, maximize p_size.
    A part is dominated iff some part has (price ≤, size ≥) with one
    strict. The classic sort-based skyline needs a GLOBAL running max
    of size in price order — expressed here with the same two-level
    prefix machinery as sequence packing (operators/prefix.py:
    range-partition → per-partition window → P-row offsets broadcast
    back), so the scan parallelism survives any SF.

    Survivor condition, derived by splitting dominance at the price
    tie: size == max size within its own price group AND exclusive
    prefix max over strictly lower prices < size.

    Oracle: the quadratic NOT-EXISTS dominance definition itself —
    an independent formulation proving the prefix derivation.
    """
    from tpg_weather_etl_spark.operators.prefix import global_running_max
    p = t(spark, sf_dir, "part")
    gm = p.groupBy("p_retailprice").agg(F.max("p_size").alias("grp_max"))
    pm = global_running_max(
        gm, ["p_retailprice"], "grp_max",
        out_col="prev_max", inclusive=False)
    return (
        p.join(pm, "p_retailprice")
        .filter((F.col("p_size") == F.col("grp_max"))
                & (F.col("prev_max").isNull()
                   | (F.col("prev_max") < F.col("p_size"))))
        .select("p_partkey", "p_name", "p_retailprice", "p_size")
    )


SQL_SKYLINE_PARTS = """
SELECT p_partkey, p_name, p_retailprice, p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice
    AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
"""


# ---------------------------------------------------------------------------
# Exact global decile bucketing — quantile boundaries from the
# distributed prefix sum, then a broadcast bucket assignment
# ---------------------------------------------------------------------------

def q_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value decile report. NTILE(10) needs a single-partition
    global sort; the scale-safe equivalent: value-frequency agg →
    distributed running count (operators/prefix.py) → the nine exact
    boundary values (rank ceil(k·n/10), 1-based, ties share a value)
    reduce to ONE broadcast row → decile(v) = #boundaries ≤ v. Two
    fact-table passes total, both map-side-combined; nothing global
    ever sits in one task.
    """
    from tpg_weather_etl_spark.operators.prefix import global_running_sum
    o = t(spark, sf_dir, "orders")
    counts = o.groupBy("o_totalprice").agg(F.count("*").alias("cnt"))
    run = global_running_sum(
        counts, ["o_totalprice"], "cnt", out_col="cum")
    tot = counts.agg(F.sum("cnt").alias("n"))
    b = run.join(F.broadcast(tot)).agg(*[
        F.min(F.when(
            F.col("cum") >= F.ceil(F.col("n") * F.lit(k) / 10),
            F.col("o_totalprice"))).alias(f"b{k}")
        for k in range(1, 10)])
    dec = o.join(F.broadcast(b)).withColumn(
        "decile",
        sum(F.when(F.col("o_totalprice") >= F.col(f"b{k}"), 1)
            .otherwise(0) for k in range(1, 10)))
    return (dec.groupBy("decile").agg(
        F.count("*").alias("n_orders"),
        _dsum(F.col("o_totalprice")).alias("sum_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price")))


_DECILE_BOUNDS = ",\n         ".join(
    f"MIN(CASE WHEN cum >= CEIL(n * {k} / 10.0) THEN o_totalprice END)"
    f" AS b{k}" for k in range(1, 10))
_DECILE_CASE = " + ".join(
    f"(CASE WHEN o_totalprice >= b{k} THEN 1 ELSE 0 END)"
    for k in range(1, 10))

SQL_DECILE_STATS = f"""
WITH counts AS (
  SELECT o_totalprice, COUNT(*) AS cnt FROM orders GROUP BY 1),
run AS (
  SELECT o_totalprice, SUM(cnt) OVER (ORDER BY o_totalprice) AS cum
  FROM counts),
tot AS (SELECT COUNT(*) AS n FROM orders),
b AS (
  SELECT {_DECILE_BOUNDS}
  FROM run, tot)
SELECT ({_DECILE_CASE}) AS decile,
       COUNT(*) AS n_orders,
       CAST(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(24,8))), 4)
            AS DECIMAL(18,4)) AS DOUBLE) AS sum_price,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders, b
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Referential-integrity audit across the whole star schema
# ---------------------------------------------------------------------------

_FK_RELATIONSHIPS = [
    # (label, fact table, fk col, dim table, pk col)
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
     "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey",
     "region", "r_regionkey"),
]


def q_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan audit of every foreign-key edge in the star schema: per
    relationship, total fact rows and rows whose key has no match in
    the dimension — the pre-flight data-quality gate any warehouse
    load runs before publishing.

    Each relationship is one left-anti join; dims broadcast, and the
    fact-side scans prune to the single key column (ReadSchema shows
    one field). The seven 1-row aggregates union into the report —
    Spark runs them as independent stages, so the audit parallelizes
    across relationships as well as within each scan.
    """
    out = None
    for label, fact, fk, dim, pk in _FK_RELATIONSHIPS:
        f = t(spark, sf_dir, fact).select(F.col(fk).alias("k"))
        d = t(spark, sf_dir, dim).select(F.col(pk).alias("k"))
        orphans = f.join(F.broadcast(d), "k", "left_anti").agg(
            F.count("*").alias("n_orphans"))
        totals = f.agg(F.count("*").alias("n_rows"))
        row = (totals.crossJoin(orphans)
               .select(F.lit(label).alias("relationship"),
                       "n_rows", "n_orphans"))
        out = row if out is None else out.unionAll(row)
    return out


SQL_FK_INTEGRITY = "\nUNION ALL\n".join(
    f"""SELECT '{label}' AS relationship,
  (SELECT COUNT(*) FROM {fact}) AS n_rows,
  (SELECT COUNT(*) FROM {fact}
   WHERE NOT EXISTS (SELECT 1 FROM {dim} WHERE {pk} = {fk}))
  AS n_orphans"""
    for label, fact, fk, dim, pk in _FK_RELATIONSHIPS)


# ---------------------------------------------------------------------------
# The last five TPC-H shapes (Q3/Q5/Q6/Q12/Q20 adapted to the
# available columns) — with these the repo covers all 22
# ---------------------------------------------------------------------------

SHIP_PRIORITY_DATE = "1998-06-15"


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: top-10 unshipped-revenue orders for one market segment —
    the classic filter-two-sides-then-join shape with a post-agg
    TakeOrderedAndProject (never a global sort).

    Both date predicates are applied BEFORE the join so each scan
    prunes independently; the customer dim broadcasts."""
    c = (t(spark, sf_dir, "customer")
         .filter(F.col("c_mktsegment") == "BUILDING")
         .select("c_custkey"))
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(SHIP_PRIORITY_DATE).cast("timestamp"))
    l = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(SHIP_PRIORITY_DATE).cast("timestamp"))
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"),
                 F.asc("l_orderkey"))
        .limit(10)
    )


SQL_SHIPPING_PRIORITY = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
  CAST(CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
       AS DECIMAL(24,8))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{SHIP_PRIORITY_DATE}'
  AND l_shipdate > TIMESTAMP '{SHIP_PRIORITY_DATE}'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
"""


LOCAL_VOLUME_REGION = "ASIA"


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: revenue per nation where the supplier and the customer are
    the SAME nation — the 6-table star with an extra equality BETWEEN
    two dimension keys (c_nationkey = s_nationkey), which prunes the
    join output far below the unconstrained star. All dims broadcast;
    orders⋈lineitem is the only real shuffle."""
    r = (t(spark, sf_dir, "region")
         .filter(F.col("r_name") == LOCAL_VOLUME_REGION))
    n = t(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s),
              (l["l_suppkey"] == s["s_suppkey"])
              & (c["c_nationkey"] == s["s_nationkey"]))
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
    )


SQL_LOCAL_SUPPLIER_VOLUME = f"""
SELECT n_name,
  CAST(CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
       AS DECIMAL(24,8))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{LOCAL_VOLUME_REGION}'
GROUP BY 1
"""


FORECAST_YEAR = 1997


def q_forecast_revenue_change(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Q6: one-table scan-filter-aggregate with range predicates on
    three columns — the purest predicate-pushdown probe in the suite
    (the whole WHERE clause must reach the parquet scan; no join, no
    shuffle beyond the 1-row reduce)."""
    l = t(spark, sf_dir, "lineitem")
    return (
        l.filter((F.year("l_shipdate") == FORECAST_YEAR)
                 & (F.col("l_discount") >= 0.05)
                 & (F.col("l_discount") <= 0.07)
                 & (F.col("l_quantity") < 24))
        .agg(_dsum(F.col("l_extendedprice") * F.col("l_discount"))
             .alias("revenue"),
             F.count("*").alias("n_rows"))
    )


SQL_FORECAST_REVENUE_CHANGE = f"""
SELECT
  CAST(CAST(ROUND(SUM(CAST(l_extendedprice * l_discount
       AS DECIMAL(24,8))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
  COUNT(*) AS n_rows
FROM lineitem
WHERE EXTRACT(year FROM l_shipdate) = {FORECAST_YEAR}
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q_returnflag_priority_counts(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Q12 (adapted: l_returnflag plays shipmode, late = shipped >30d
    after order date): per flag, how many lines belong to
    high-priority vs other orders — the join + CONDITIONAL-COUNT
    shape where the classification happens in the aggregate, not a
    pre-split."""
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    j = l.join(o, l["l_orderkey"] == o["o_orderkey"]).filter(
        F.col("l_shipdate") > F.col("o_orderdate")
        + F.expr("INTERVAL 30 DAYS"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (j.groupBy("l_returnflag")
            .agg(F.sum(F.when(high, 1).otherwise(0))
                 .cast("bigint").alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0))
                 .cast("bigint").alias("low_line_count")))


SQL_RETURNFLAG_PRIORITY_COUNTS = """
SELECT l_returnflag,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
GROUP BY 1
"""


EXCESS_PART_FRAGMENT = "red"
EXCESS_QTY_THRESHOLD = 90.0


def q_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 (adapted: shipped quantity plays availqty): suppliers who
    shipped more than a threshold quantity of some name-filtered part
    — a semi-join against an AGGREGATED subquery (the nesting TPC-H
    uses to stress decorrelation). The aggregate runs first at
    (supplier, part) grain; the distinct supplier set then semi-joins
    the supplier dim."""
    p = (t(spark, sf_dir, "part")
         .filter(F.col("p_name").contains(EXCESS_PART_FRAGMENT))
         .select("p_partkey"))
    l = t(spark, sf_dir, "lineitem")
    heavy = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > EXCESS_QTY_THRESHOLD)
        .select("l_suppkey").distinct())
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        s.join(heavy, s["s_suppkey"] == heavy["l_suppkey"], "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .select("s_suppkey", "s_name", "n_name")
    )


SQL_EXCESS_SUPPLIERS = f"""
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%{EXCESS_PART_FRAGMENT}%'
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(l_quantity) > {EXCESS_QTY_THRESHOLD})
"""


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "fk_integrity": q_fk_integrity,
    "shipping_priority": q_shipping_priority,
    "local_supplier_volume": q_local_supplier_volume,
    "forecast_revenue_change": q_forecast_revenue_change,
    "returnflag_priority_counts": q_returnflag_priority_counts,
    "excess_suppliers": q_excess_suppliers,
    "min_cost_supplier": q_min_cost_supplier,
    "profit_by_nation_year": q_profit_by_nation_year,
    "important_parts": q_important_parts,
    "supplier_cnt_by_type": q_supplier_cnt_by_type,
    "waiting_orders": q_waiting_orders,
    "skyline_parts": q_skyline_parts,
    "decile_stats": q_decile_stats,
    "cube_revenue": q_cube_revenue,
    "unpivot_metrics": q_unpivot_metrics,
    "volume_shipping": q_volume_shipping,
    "market_share": q_market_share,
    "returned_items": q_returned_items,
    "top_supplier": q_top_supplier,
    "priority_late_orders": q_priority_late_orders,
    "disjunctive_pred_revenue": q_disjunctive_pred_revenue,
    "idle_customer_balance": q_idle_customer_balance,
    "promo_revenue": q_promo_revenue,
    "rollup_revenue": q_rollup_revenue,
    "pivot_event_values": q_pivot_event_values,
    "intersect_except": q_intersect_except,
    "interval_join": q_interval_join,
    "rank_functions": q_rank_functions,
    "snapshot_diff": q_snapshot_diff,
    "null_safe_join": q_null_safe_join,
    "sql_api_revenue": q_sql_api_revenue,
    "lateral_top_items": q_lateral_top_items,
    "revenue_share": q_revenue_share,
    "order_count_distribution": q_order_count_distribution,
    "big_orders": q_big_orders,
    "small_quantity_revenue": q_small_quantity_revenue,
    "salted_join_revenue": q_salted_join_revenue,
    "constraint_report": q_constraint_report,
    "fuzzy_match_sources": q_fuzzy_match_sources,
    "top_orders": q_top_orders,
    "region_revenue": q_region_revenue,
    "semi_join_parts": q_semi_join_parts,
    "anti_join_customers": q_anti_join_customers,
    "left_join_enrich": q_left_join_enrich,
    "dedupe_exact": q_dedupe_exact,
    "dedupe_priority": q_dedupe_priority,
    "group_median": q_group_median,
    "agg_by_bin": q_agg_by_bin,
    "dominant_event_type": q_dominant_event_type,
    "distinct_months": q_distinct_months,
    "minmax_bounds": q_minmax_bounds,
    "null_profile": q_null_profile,
    "latest_per_user": q_latest_per_user,
    "topk_latest": q_topk_latest,
    "deterministic_sample": q_deterministic_sample,
    "scalar_bins": q_scalar_bins,
    "time_features": q_time_features,
    "lag_grid": q_lag_grid,
    "rolling_7d": q_rolling_7d,
    "asof_join": q_asof_join,
}

ORACLE = {
    "pricing_summary": SQL_PRICING_SUMMARY,
    "fk_integrity": SQL_FK_INTEGRITY,
    "shipping_priority": SQL_SHIPPING_PRIORITY,
    "local_supplier_volume": SQL_LOCAL_SUPPLIER_VOLUME,
    "forecast_revenue_change": SQL_FORECAST_REVENUE_CHANGE,
    "returnflag_priority_counts": SQL_RETURNFLAG_PRIORITY_COUNTS,
    "excess_suppliers": SQL_EXCESS_SUPPLIERS,
    "min_cost_supplier": SQL_MIN_COST_SUPPLIER,
    "profit_by_nation_year": SQL_PROFIT_BY_NATION_YEAR,
    "important_parts": SQL_IMPORTANT_PARTS,
    "supplier_cnt_by_type": SQL_SUPPLIER_CNT_BY_TYPE,
    "waiting_orders": SQL_WAITING_ORDERS,
    "skyline_parts": SQL_SKYLINE_PARTS,
    "decile_stats": SQL_DECILE_STATS,
    "cube_revenue": SQL_CUBE_REVENUE,
    "unpivot_metrics": SQL_UNPIVOT_METRICS,
    "volume_shipping": SQL_VOLUME_SHIPPING,
    "market_share": SQL_MARKET_SHARE,
    "returned_items": SQL_RETURNED_ITEMS,
    "top_supplier": SQL_TOP_SUPPLIER,
    "priority_late_orders": SQL_PRIORITY_LATE_ORDERS,
    "disjunctive_pred_revenue": SQL_DISJUNCTIVE_PRED_REVENUE,
    "idle_customer_balance": SQL_IDLE_CUSTOMER_BALANCE,
    "promo_revenue": SQL_PROMO_REVENUE,
    "rollup_revenue": SQL_ROLLUP_REVENUE,
    "pivot_event_values": SQL_PIVOT_EVENT_VALUES,
    "intersect_except": SQL_INTERSECT_EXCEPT,
    "interval_join": SQL_INTERVAL_JOIN,
    "rank_functions": SQL_RANK_FUNCTIONS,
    "snapshot_diff": SQL_SNAPSHOT_DIFF,
    "null_safe_join": SQL_NULL_SAFE_JOIN,
    "sql_api_revenue": SQL_API_STATEMENT,
    "lateral_top_items": SQL_LATERAL_TOP_ITEMS,
    "revenue_share": SQL_REVENUE_SHARE,
    "order_count_distribution": SQL_ORDER_COUNT_DISTRIBUTION,
    "big_orders": SQL_BIG_ORDERS,
    "small_quantity_revenue": SQL_SMALL_QUANTITY_REVENUE,
    "salted_join_revenue": SQL_SALTED_JOIN_REVENUE,
    "constraint_report": SQL_CONSTRAINT_REPORT,
    "fuzzy_match_sources": SQL_FUZZY_MATCH_SOURCES,
    "top_orders": SQL_TOP_ORDERS,
    "region_revenue": SQL_REGION_REVENUE,
    "semi_join_parts": SQL_SEMI_JOIN_PARTS,
    "anti_join_customers": SQL_ANTI_JOIN_CUSTOMERS,
    "left_join_enrich": SQL_LEFT_JOIN_ENRICH,
    "dedupe_exact": SQL_DEDUPE_EXACT,
    "dedupe_priority": SQL_DEDUPE_PRIORITY,
    "group_median": SQL_GROUP_MEDIAN,
    "agg_by_bin": SQL_AGG_BY_BIN,
    "dominant_event_type": SQL_DOMINANT_EVENT_TYPE,
    "distinct_months": SQL_DISTINCT_MONTHS,
    "minmax_bounds": SQL_MINMAX_BOUNDS,
    "null_profile": SQL_NULL_PROFILE,
    "latest_per_user": SQL_LATEST_PER_USER,
    "topk_latest": SQL_TOPK_LATEST,
    "deterministic_sample": SQL_DETERMINISTIC_SAMPLE,
    "scalar_bins": SQL_SCALAR_BINS,
    "time_features": SQL_TIME_FEATURES,
    "lag_grid": SQL_LAG_GRID,
    "rolling_7d": SQL_ROLLING_7D,
    "asof_join": SQL_ASOF_JOIN,
}
