"""Gate queries for the remaining scalar/set operator classes:
robust boolean cast (F11), status ranking (F12), regexp field
extraction (F4), case-insensitive contains (P3), shard union (S8/§2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tpg_weather_etl_spark.functions.macros import robust_bool, status_rank
from tpg_weather_etl_spark.functions.text import stable_hash60, token_count
from tpg_weather_etl_spark.functions.time import dow_monday0, epoch_us
from tpg_weather_etl_spark.queries_relational import _dsum
from tpg_weather_etl_spark.sources.tables import read_table as t


# ---------------------------------------------------------------------------
# F11 + F12 + F4: normalize-style scalar pipeline over events.props
# (reference 02_ingest_istdaten.py:210-220, 263-268; month regex 02:101-108)
# ---------------------------------------------------------------------------

def q_scalar_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), r'"k": (\d+)', 1)
    k_int = k.cast("int")
    return e.select(
        "event_id",
        k_int.alias("k_val"),
        # F11 robust bool applied to a derived token: odd k → "1"/"0"
        robust_bool(F.when(k_int % 2 == 1, F.lit("1")).otherwise(F.lit("no"))
                    ).alias("k_odd_bool"),
        # F12 status-rank mapping applied to event_type strings
        status_rank(
            F.when(F.col("event_type") == "purchase", "REAL")
            .when(F.col("event_type") == "signup", "GESCHAETZT")
            .when(F.col("event_type") == "click", "PROGNOSE")
            .otherwise(F.col("event_type"))
        ).alias("type_rank"),
    )


SQL_SCALAR_NORMALIZE = """
SELECT event_id,
  CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INTEGER) AS k_val,
  CASE WHEN lower(trim(CASE WHEN CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INTEGER) % 2 = 1
                            THEN '1' ELSE 'no' END)) IN ('1','true')
       THEN TRUE ELSE FALSE END AS k_odd_bool,
  CAST(CASE upper(coalesce(CASE WHEN event_type = 'purchase' THEN 'REAL'
                 WHEN event_type = 'signup' THEN 'GESCHAETZT'
                 WHEN event_type = 'click' THEN 'PROGNOSE'
                 ELSE event_type END, ''))
    WHEN 'REAL' THEN 3 WHEN 'IST' THEN 3 WHEN 'GESCHAETZT' THEN 2
    WHEN 'PROGNOSE' THEN 1 ELSE 0 END AS INTEGER) AS type_rank
FROM events
"""


# ---------------------------------------------------------------------------
# P3: case-insensitive substring predicate (01_ingest_gtfs.py:152-155)
# ---------------------------------------------------------------------------

def q_contains_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.filter(
        F.lower(F.col("text")).contains("spark merge")
    ).select("doc_id", "lang", "n_chars")


SQL_CONTAINS_FILTER = """
SELECT doc_id, lang, n_chars FROM documents
WHERE contains(lower(text), 'spark merge')
"""


# ---------------------------------------------------------------------------
# S8 / §2.7: multi-shard UNION ALL + re-aggregation
# ---------------------------------------------------------------------------

def q_union_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click")
    errors = e.filter(F.col("event_type") == "error")
    return (
        clicks.unionByName(errors)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.count_distinct(F.col("user_id")).alias("n_users"))
    )


SQL_UNION_SHARDS = """
SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
FROM (SELECT * FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT * FROM events WHERE event_type = 'error')
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Dashboard analytics: hour × day-of-week heatmap aggregation
# (app/streamlit_by_stop_line.py:269-291) and KPI tile sums (A11,
# app/streamlit_app.py:112-175)
# ---------------------------------------------------------------------------

def q_heatmap_hour_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(
            dow_monday0(F.col("ts")).alias("dow"),
            F.hour("ts").cast("long").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (_dsum(F.col("value")) / F.count("value")).alias("value_avg"),
        )
    )


SQL_HEATMAP_HOUR_DOW = """
SELECT CAST((dayofweek(ts) + 6) % 7 AS INTEGER) AS dow,
       hour(ts) AS hour, COUNT(*) AS n,
       CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(24,8))), 4)
            AS DECIMAL(18,4)) AS DOUBLE) / COUNT(value) AS value_avg
FROM events GROUP BY 1, 2
"""


def q_kpi_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("value") >= 20.0, 1).otherwise(0)).alias("n_ge20"),
        F.sum(F.when(F.col("props").isNotNull(), 1).otherwise(0)).alias("n_with_props"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
         .alias("n_errors"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
    )


SQL_KPI_SUMMARY = """
SELECT COUNT(*) AS n_rows,
  CAST(SUM(CASE WHEN value >= 20.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ge20,
  CAST(SUM(CASE WHEN props IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_with_props,
  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
  COUNT(DISTINCT user_id) AS n_users
FROM events
"""


# ---------------------------------------------------------------------------
# Gap-based sessionization: 30-min-inactivity sessions per user via a
# cumulative window over the new-session indicator
# ---------------------------------------------------------------------------

SESSION_GAP_SEC = 1800


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions split at >30-min gaps, with session stats.

    The classic event-pipeline operator Spark lacks as a built-in:
    lag() marks session starts, a running sum over the same window
    assigns session ids, then one aggregation produces the session
    table. Two window passes share a single shuffle on user_id (same
    partitioning + ordering); gap arithmetic is integer microseconds
    (``unix_micros``/``epoch_us``) so both engines compare exactly.
    """
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events").withColumn(
        "tus", epoch_us(F.col("ts"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_s = F.when(
        F.lag("tus").over(w).isNull()
        | ((F.col("tus") - F.lag("tus").over(w)) > SESSION_GAP_SEC * 1_000_000),
        1,
    ).otherwise(0)
    sess = e.withColumn("new_s", new_s).withColumn(
        "session_seq",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        ((F.max("tus") - F.min("tus")) / F.lit(1_000_000))
        .cast("long").alias("duration_sec"),
        _dsum(F.col("value")).alias("value_sum"),
    )


SQL_SESSIONIZE = f"""
WITH e AS (SELECT user_id, event_id, ts, value, epoch_us(ts) AS tus
           FROM events),
m AS (SELECT *, CASE WHEN lag(tus) OVER w IS NULL
                       OR tus - lag(tus) OVER w > {SESSION_GAP_SEC * 1_000_000}
                     THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM m)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
  COUNT(*) AS n_events,
  MIN(ts) AS session_start, MAX(ts) AS session_end,
  CAST((MAX(tus) - MIN(tus)) // 1000000 AS BIGINT) AS duration_sec,
  CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(24,8))), 4)
       AS DECIMAL(18,4)) AS DOUBLE) AS value_sum
FROM s GROUP BY user_id, session_seq
"""


# ---------------------------------------------------------------------------
# Native session windows: F.session_window (the built-in gap-based
# session operator, also the streaming form) cross-validated against
# the classic lag+cumsum SQL sessionization
# ---------------------------------------------------------------------------

def q_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions via Spark's native ``session_window`` (30-min
    gap), returning the same stats as ``q_sessionize``.

    The oracle derives sessions the classic way (lag → new-session
    flag → running sum), proving the built-in operator implements
    exactly gap-based semantics. Note the boundary convention:
    ``session_window`` extends a session while the NEXT event starts
    strictly before current_ts + gap, i.e. an event landing exactly at
    the 30-minute mark opens a NEW session — hence the oracle uses
    ``>=`` where ``q_sessionize`` uses ``>``. At scale this is one
    shuffle on (user_id, merged windows); the streaming variant is the
    same call under ``groupBy`` on a stream.
    """
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id",
                  F.session_window("ts", f"{SESSION_GAP_SEC} seconds"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_event"),
            F.max("ts").alias("last_event"),
        )
        .select("user_id",
                F.col("session_window.start").alias("w_start"),
                F.col("session_window.end").alias("w_end"),
                "n_events", "first_event", "last_event")
    )


SQL_SESSION_WINDOW_AGG = f"""
WITH e AS (SELECT user_id, event_id, ts, epoch_us(ts) AS tus FROM events),
m AS (SELECT *, CASE WHEN lag(tus) OVER w IS NULL
                       OR tus - lag(tus) OVER w >= {SESSION_GAP_SEC * 1_000_000}
                     THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM m)
SELECT user_id,
  MIN(ts) AS w_start,
  MAX(ts) + INTERVAL {SESSION_GAP_SEC} SECOND AS w_end,
  COUNT(*) AS n_events,
  MIN(ts) AS first_event, MAX(ts) AS last_event
FROM s GROUP BY user_id, session_seq
"""


# ---------------------------------------------------------------------------
# Sequential pattern matching: A followed by B within a time window
# (the MATCH_RECOGNIZE-lite every event pipeline needs) — expressed as
# one lag window over the type-filtered stream, NOT a self-join
# ---------------------------------------------------------------------------

PATTERN_WINDOW_SEC = 1800


def q_pattern_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: how many purchases directly follow a click (no other
    click/purchase between) within 30 minutes, plus the fastest such
    conversion.

    Scale shape: filter to the two event classes map-side, ONE window
    pass on (user_id, ts) — a self-join formulation would shuffle the
    event table twice and explode on hot users; the lag form shuffles
    the filtered stream once.
    """
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "ts", "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        (epoch_us(F.col("ts")) - F.lag(epoch_us(F.col("ts")))
         .over(w)).alias("gap_us"),
    )
    hits = seq.filter(
        (F.col("event_type") == "purchase")
        & (F.col("prev_type") == "click")
        & (F.col("gap_us") <= PATTERN_WINDOW_SEC * 1_000_000)
    )
    return hits.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        (F.min("gap_us") / 1_000_000).cast("long")
        .alias("fastest_sec"),
    )


SQL_PATTERN_WITHIN = f"""
WITH e AS (SELECT user_id, event_id, ts, event_type, epoch_us(ts) AS tus
           FROM events WHERE event_type IN ('click', 'purchase')),
seq AS (SELECT user_id, event_type,
          lag(event_type) OVER w AS prev_type,
          tus - lag(tus) OVER w AS gap_us
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, COUNT(*) AS n_conversions,
  CAST(MIN(gap_us) // 1000000 AS BIGINT) AS fastest_sec
FROM seq
WHERE event_type = 'purchase' AND prev_type = 'click'
  AND gap_us <= {PATTERN_WINDOW_SEC * 1_000_000}
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Numeric profiling: per-column min/max/mean/stddev with
# order-independent decimal-exact moments (double stddev aggregates
# are order-dependent under AQE and never hash-match across engines)
# ---------------------------------------------------------------------------

def q_numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling pass over numeric columns: count / nulls / min /
    max / mean / sample-stddev per event type.

    Moments come from exact decimal Σx and Σx² (order-independent),
    variance = (n·Σx² − (Σx)²) / (n·(n−1)) computed in decimal, then
    rounded to 6 — bit-identical in both engines, unlike built-in
    ``stddev`` which folds doubles in partition arrival order.
    """
    e = t(spark, sf_dir, "events")
    # square terms at (18,6): the product stays within Spark's
    # precision-38 cap AND DuckDB's int64 physical multiply for this
    # value range; decimal division/multiplication scale rules differ
    # across engines past that, so sums are rounded ONCE and the
    # variance is then pure double arithmetic (IEEE ops are correctly
    # rounded → identical)
    x = F.col("value").cast("decimal(18,6)")
    n = F.count("value")
    nd = n.cast("double")
    s1d = F.round(F.sum(x), 6).cast("double")
    s2d = F.round(F.sum(x * x), 6).cast("double")
    var = (nd * s2d - s1d * s1d) / (nd * (nd - F.lit(1.0)))
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").isNull().cast("int")).alias("n_nulls"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
        (F.round(F.round(F.sum(x), 4).cast("decimal(18,4)").cast("double")
                 / n, 6) + 0.0).alias("v_mean"),
        (F.round(var, 6) + 0.0).alias("v_var"),
    )


SQL_NUMERIC_PROFILE = """
SELECT event_type, COUNT(*) AS n_rows,
  CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
  MIN(value) AS v_min, MAX(value) AS v_max,
  round(CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4)
             AS DECIMAL(18,4)) AS DOUBLE) / COUNT(value), 6) + 0.0 AS v_mean,
  round((CAST(COUNT(value) AS DOUBLE)
           * CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))
                            * CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE)
         - CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE)
           * CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE))
        / (CAST(COUNT(value) AS DOUBLE)
           * (CAST(COUNT(value) AS DOUBLE) - 1.0)), 6) + 0.0 AS v_var
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Daily quantile trend: per-day discrete p50/p90 bands — the
# monitoring time series every pipeline dashboard plots (reuses the
# A8 quantile operator over a calendar grouping)
# ---------------------------------------------------------------------------

def q_daily_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day p50/p90 of event values plus count — one window rank
    pass and one agg sharing the day shuffle (operators/quantiles).
    """
    from tpg_weather_etl_spark.operators.quantiles import (
        with_group_quantiles,
    )

    e = t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "value"
    )
    return with_group_quantiles(
        e, ["day"], "value", {"p50": 0.5, "p90": 0.9},
        extra_aggs=[F.count(F.lit(1)).alias("n")],
    )


SQL_DAILY_VALUE_QUANTILES = """
SELECT CAST(ts AS DATE) AS day,
  quantile_disc(value, 0.5) AS p50,
  quantile_disc(value, 0.9) AS p90,
  COUNT(*) AS n
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Sliding (hopping) time windows: F.window with slide < width — each
# event lands in width/slide overlapping windows (the smoothed-rate
# view; same operator drives the streaming form)
# ---------------------------------------------------------------------------

SLIDE_WIDTH_MIN = 60
SLIDE_STEP_MIN = 30


def q_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event counts and value sums per 60-minute window sliding every
    30 minutes (each event feeds exactly 2 windows).

    Spark's ``F.window`` expands the row to its covering windows
    map-side (a Generate of width/slide rows), then one hash agg on
    window start — the same plan the streaming engine runs
    incrementally. The oracle derives each event's covering window
    starts arithmetically.
    """
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", f"{SLIDE_WIDTH_MIN} minutes",
                     f"{SLIDE_STEP_MIN} minutes").alias("w"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"),
             _dsum(F.col("value")).alias("value_sum"))
        .select(F.col("w.start").alias("w_start"),
                F.col("w.end").alias("w_end"),
                "event_type", "n", "value_sum")
    )


SQL_SLIDING_WINDOW_COUNTS = f"""
WITH e AS (SELECT ts, event_type, value,
             epoch_us(ts) // ({SLIDE_STEP_MIN} * 60 * 1000000)
               AS step_idx
           FROM events),
x AS (SELECT ts, event_type, value,
        unnest(range(step_idx - {SLIDE_WIDTH_MIN // SLIDE_STEP_MIN} + 1,
                     step_idx + 1)) AS w_idx
      FROM e)
SELECT make_timestamp(w_idx * {SLIDE_STEP_MIN} * 60 * 1000000) AS w_start,
  make_timestamp((w_idx + {SLIDE_WIDTH_MIN // SLIDE_STEP_MIN})
                 * {SLIDE_STEP_MIN} * 60 * 1000000) AS w_end,
  event_type, COUNT(*) AS n,
  CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(24,8))), 4)
       AS DECIMAL(18,4)) AS DOUBLE) AS value_sum
FROM x GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Gaps-and-islands / SCD2 interval compression: collapse consecutive
# equal values per key into validity intervals — the slowly-changing-
# dimension (type 2) build step
# ---------------------------------------------------------------------------

def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse each user's consecutive same-event_type runs into
    [valid_from, valid_to) intervals (valid_to = next run's start,
    NULL on the open tail) — the gaps-and-islands pattern: the
    difference of two row_numbers (overall vs per-value) is constant
    exactly within a run.

    Scale shape: both row_number windows and the island aggregation
    share one user_id shuffle; interval close (lead over islands) is a
    window over the already-small island table.
    """
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_val = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id")
    runs = e.select(
        "user_id", "event_type", "ts", "event_id",
        (F.row_number().over(w_all) - F.row_number().over(w_val))
        .alias("grp"),
    )
    islands = runs.groupBy("user_id", "event_type", "grp").agg(
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_seq = Window.partitionBy("user_id").orderBy("valid_from")
    return islands.select(
        "user_id", "event_type", "valid_from", "n_events",
        F.lead("valid_from").over(w_seq).alias("valid_to"),
    )


SQL_SCD2_INTERVALS = """
WITH runs AS (
  SELECT user_id, event_type, ts, event_id,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      - row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS grp
  FROM events),
islands AS (
  SELECT user_id, event_type, grp,
    MIN(ts) AS valid_from, COUNT(*) AS n_events
  FROM runs GROUP BY 1, 2, 3)
SELECT user_id, event_type, valid_from, n_events,
  lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
    AS valid_to
FROM islands
"""


# ---------------------------------------------------------------------------
# Deterministic weighted sampling without replacement
# (Efraimidis–Spirakis): rank by u^(1/w) with u derived from md5 —
# the one-pass distributed weighted reservoir
# ---------------------------------------------------------------------------

WSAMPLE_K = 50


def q_weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample the ``WSAMPLE_K`` documents with the largest
    Efraimidis–Spirakis keys, weighting by token count: rank on
    −ln(u)/w ascending where u ∈ (0,1] is md5-derived — equivalent to
    u^(1/w) descending but numerically stabler; deterministic, so
    hash-checkable and repeatable across runs/engines.

    Scale shape: the ES key is map-side arithmetic; top-k is a
    TakeOrderedAndProject (per-partition heaps + one k-row merge) —
    the whole corpus is never sorted. Keys round to 9 decimals before
    ranking (libm ulp differences) with doc_id as the total-order tie
    break in both engines.
    """
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        token_count(F.col("text")).alias("w"),
    ).filter(F.col("w") >= 1)
    # u in (0,1]: (h+1) / 2^60 with h uniform in [0, 2^60)
    u = (stable_hash60(F.col("doc_id").cast("string")) + 1) / F.lit(
        float(2 ** 60))
    es_key = F.round(-F.log(u) / F.col("w"), 9)
    return (
        d.select("doc_id", "w", es_key.alias("es_key"))
        .orderBy(F.col("es_key").asc(), F.col("doc_id").asc())
        .limit(WSAMPLE_K)
    )


SQL_WEIGHTED_SAMPLE_TOPK = f"""
WITH d AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS w,
    (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1)
      / 1152921504606846976.0 AS u
  FROM documents),
k AS (SELECT doc_id, w, round(-ln(u) / w, 9) AS es_key
      FROM d WHERE w >= 1)
SELECT doc_id, w, es_key FROM k
ORDER BY es_key ASC, doc_id ASC LIMIT {WSAMPLE_K}
"""


# ---------------------------------------------------------------------------
# Cohort retention: weekly signup cohorts × activity-week offset
# ---------------------------------------------------------------------------

def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users active per (first-seen week cohort, week offset).

    Both engines truncate to ISO Monday weeks, so offsets are exact
    multiples of 7 days. Scale shape: one groupBy(user) for cohorts
    (re-broadcast if users ≪ events, else a co-partitioned join on
    user_id), one distinct on (user, week), one final small agg.
    """
    e = t(spark, sf_dir, "events").select(
        "user_id",
        F.to_date(F.date_trunc("week", F.col("ts"))).alias("wk"),
    )
    first = e.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    act = e.distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            "cohort_wk",
            (F.datediff(F.col("wk"), F.col("cohort_wk")) / 7)
            .cast("int").alias("week_offset"),
        )
        .agg(F.count_distinct(F.col("user_id")).alias("n_users"))
    )


SQL_COHORT_RETENTION = """
WITH e AS (SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
           FROM events),
first AS (SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY 1),
act AS (SELECT DISTINCT user_id, wk FROM e)
SELECT cohort_wk,
       CAST((act.wk - first.cohort_wk) // 7 AS INTEGER) AS week_offset,
       COUNT(DISTINCT act.user_id) AS n_users
FROM act JOIN first USING (user_id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Ordered funnel: signup → view → click → purchase by first-occurrence
# timestamps per user
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("signup", "view", "click", "purchase")


def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users reaching each ordered funnel step (min-timestamp funnel:
    step k counts users whose first step-k event is strictly after
    their first step-(k-1) event).

    One groupBy(user_id) computes all four conditional mins in a
    single pass (map-side combine); the funnel flags and final count
    are a second tiny aggregation. At 100 TB: one shuffle of per-user
    partial mins, nothing else.
    """
    e = t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(*[
        F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t{i}")
        for i, s in enumerate(FUNNEL_STEPS, start=1)
    ])
    r1 = F.col("t1").isNotNull()
    r2 = r1 & (F.col("t2") > F.col("t1"))
    r3 = r2 & (F.col("t3") > F.col("t2"))
    r4 = r3 & (F.col("t4") > F.col("t3"))
    return per_user.agg(
        F.sum(r1.cast("int")).alias("n_signup"),
        F.sum(r2.cast("int")).alias("n_view"),
        F.sum(r3.cast("int")).alias("n_click"),
        F.sum(r4.cast("int")).alias("n_purchase"),
    )


SQL_FUNNEL_STEPS = """
WITH per_user AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t1,
    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t2,
    MIN(CASE WHEN event_type = 'click' THEN ts END) AS t3,
    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t4
  FROM events GROUP BY 1)
SELECT
  CAST(SUM(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
  CAST(SUM(CASE WHEN t1 IS NOT NULL AND t2 > t1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_view,
  CAST(SUM(CASE WHEN t1 IS NOT NULL AND t2 > t1 AND t3 > t2
            THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
  CAST(SUM(CASE WHEN t1 IS NOT NULL AND t2 > t1 AND t3 > t2 AND t4 > t3
            THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
FROM per_user
"""


# ---------------------------------------------------------------------------
# Semi-structured extraction: schema-full JSON parsing of events.props
# (the ingestion surface for event payloads; reference keeps props as
# opaque strings — this is the structured path a warehouse needs)
# ---------------------------------------------------------------------------

def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON ``props`` payload and aggregate on the extracted
    field — exercises both JSON APIs: ``from_json`` with an explicit
    schema (the vectorized schema-full path; at scale this is a single
    pass with no shuffle before the groupBy) and ``get_json_object``
    (the ad-hoc JSONPath probe).

    Scale shape: JSON parsing is per-row JVM work (Jackson inside
    codegen), the aggregation is a ~10-key hash agg with map-side
    combine — nothing here grows with the corpus except the scan.
    """
    e = t(spark, sf_dir, "events")
    parsed = e.withColumn("j", F.from_json(F.col("props"), "k INT"))
    # the JSONPath form, used for a conditional count
    k_path = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        parsed.groupBy(
            F.floor(F.col("j.k") / 10).cast("int").alias("k_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.col("j.k")).alias("k_min"),
            F.max(F.col("j.k")).alias("k_max"),
            F.sum((k_path >= 50).cast("int")).alias("n_ge50"),
            _dsum(F.col("value")).alias("value_sum"),
        )
    )


SQL_JSON_EXTRACT = """
WITH p AS (SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
                  value
           FROM events)
SELECT CAST(k // 10 AS INTEGER) AS k_bucket, COUNT(*) AS n,
  MIN(k) AS k_min, MAX(k) AS k_max,
  CAST(SUM(CASE WHEN k >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_ge50,
  CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(24,8))), 4)
       AS DECIMAL(18,4)) AS DOUBLE) AS value_sum
FROM p GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Gap-fill / resample: regular per-user hourly grid with forward fill
# — the time-series normalization step (reference builds a 10-min
# weather grid the same way; this generalizes it to per-key grids)
# ---------------------------------------------------------------------------

def q_gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's event values onto an hourly grid spanning
    the user's observed range, forward-filling gaps from the latest
    observation in-or-before each grid hour.

    Plan: per-user MIN/MAX (one agg) → ``sequence`` + ``explode``
    generates grid rows JVM-side (no driver loop, no cross join);
    per-(user, hour) latest observation via one row_number window;
    forward fill via ``last(ignorenulls=True)`` over the user window.
    The two windows and the grid join all share the user_id hash
    partitioning — at scale this is one shuffle of the observations
    plus the generated grid, which is bounded by keys × ticks, not by
    the event count.
    """
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    bounds = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.max("ts").alias("t1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("t0"), F.col("t1"), F.expr("interval 1 hour"))
        ).alias("grid_ts"),
    )
    w_bin = Window.partitionBy(
        "user_id", F.date_trunc("hour", F.col("ts"))
    ).orderBy(F.col("ts").desc(), F.col("event_id").desc())
    obs = (
        e.withColumn("rn", F.row_number().over(w_bin))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.date_trunc("hour", F.col("ts")).alias("grid_ts"),
            F.col("value").alias("v_obs"),
        )
    )
    w_ff = (
        Window.partitionBy("user_id")
        .orderBy("grid_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, ["user_id", "grid_ts"], "left")
        .select(
            "user_id", "grid_ts",
            F.last("v_obs", ignorenulls=True).over(w_ff).alias("v_filled"),
            F.col("v_obs").isNotNull().alias("is_observed"),
        )
    )


SQL_GAP_FILL_FORWARD = """
WITH bounds AS (
  SELECT user_id, date_trunc('hour', MIN(ts)) AS t0, MAX(ts) AS t1
  FROM events GROUP BY 1),
grid AS (
  SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS grid_ts
  FROM bounds),
obs AS (
  SELECT user_id, date_trunc('hour', ts) AS grid_ts, value AS v_obs
  FROM (SELECT *, row_number() OVER (
          PARTITION BY user_id, date_trunc('hour', ts)
          ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
  WHERE rn = 1)
SELECT g.user_id, g.grid_ts,
  last_value(o.v_obs IGNORE NULLS) OVER (
    PARTITION BY g.user_id ORDER BY g.grid_ts
    ROWS UNBOUNDED PRECEDING) AS v_filled,
  o.v_obs IS NOT NULL AS is_observed
FROM grid g
LEFT JOIN obs o ON o.user_id = g.user_id AND o.grid_ts = g.grid_ts
"""


# ---------------------------------------------------------------------------
# Gap-fill with LINEAR interpolation — the sensor-series companion to
# forward fill: each missing grid point takes
# v_prev + (v_next − v_prev)·(t − t_prev)/(t_next − t_prev); edges
# with no observation on one side stay NULL.
# ---------------------------------------------------------------------------

def q_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-user grid with linear interpolation across gaps.

    Same one-shuffle layout as ``gap_fill_forward`` (grid generation,
    the per-hour latest-obs window, and BOTH directional fill windows
    all share the user_id hash partitioning). The bracketing
    (value, ts) pairs come from last/first ``ignorenulls`` windows;
    the fraction divides exact µs bigints (identical doubles in both
    engines — no sums, so no decimal routing needed), and the result
    rounds to 6 with -0.0 normalized.
    """
    from pyspark.sql import Window

    from tpg_weather_etl_spark.functions.time import epoch_us

    e = t(spark, sf_dir, "events")
    bounds = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.max("ts").alias("t1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("t0"), F.col("t1"), F.expr("interval 1 hour"))
        ).alias("grid_ts"),
    )
    w_bin = Window.partitionBy(
        "user_id", F.date_trunc("hour", F.col("ts"))
    ).orderBy(F.col("ts").desc(), F.col("event_id").desc())
    obs = (
        e.withColumn("rn", F.row_number().over(w_bin))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.date_trunc("hour", F.col("ts")).alias("grid_ts"),
            F.col("value").alias("v_obs"),
        )
    )
    w_back = (
        Window.partitionBy("user_id").orderBy("grid_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Forward-looking values via a DESCENDING window with an
    # UnboundedPreceding frame: Spark's UnboundedFollowing frame
    # re-aggregates the remainder of the partition for every row
    # (O(n²) — measured 10.6s vs 1.5s for the forward-fill twin at
    # sf0.1); the reversed-order running frame is the O(n) streaming
    # form of the same quantity. Same partitioning, so still one
    # shuffle — just one extra in-partition sort.
    w_fwd = (
        Window.partitionBy("user_id").orderBy(F.col("grid_ts").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_ts = F.when(F.col("v_obs").isNotNull(), F.col("grid_ts"))
    j = (
        grid.join(obs, ["user_id", "grid_ts"], "left")
        .select(
            "user_id", "grid_ts", "v_obs",
            F.last("v_obs", ignorenulls=True).over(w_back).alias("v_prev"),
            F.last(obs_ts, ignorenulls=True).over(w_back).alias("t_prev"),
            F.last("v_obs", ignorenulls=True).over(w_fwd).alias("v_next"),
            F.last(obs_ts, ignorenulls=True).over(w_fwd).alias("t_next"),
        )
    )
    frac = (
        (epoch_us(F.col("grid_ts")) - epoch_us(F.col("t_prev")))
        .cast("double")
        / F.nullif(
            (epoch_us(F.col("t_next")) - epoch_us(F.col("t_prev")))
            .cast("double"),
            F.lit(0.0),
        )
    )
    interp = F.when(
        F.col("v_obs").isNotNull(), F.col("v_obs")
    ).otherwise(
        F.col("v_prev") + (F.col("v_next") - F.col("v_prev")) * frac
    )
    # Round via floor(v*1e6 + 0.5)/1e6 in pure IEEE double ops:
    # midpoint interpolation (frac = k/2^m) lands on EXACT decimal .5
    # ties where Spark's BigDecimal HALF_UP and DuckDB's scaled-double
    # round() disagree (8/105k rows at sf0.01); floor is exact and
    # identical everywhere, so the tie rule is defined by construction.
    return j.select(
        "user_id", "grid_ts",
        (F.floor(interp * F.lit(1000000.0)
                 + F.lit(0.5)).cast("double") / F.lit(1000000.0)
         + F.lit(0.0)).alias("v_interp"),
        F.col("v_obs").isNotNull().alias("is_observed"),
    )


SQL_GAP_FILL_INTERPOLATE = """
WITH bounds AS (
  SELECT user_id, date_trunc('hour', MIN(ts)) AS t0, MAX(ts) AS t1
  FROM events GROUP BY 1),
grid AS (
  SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS grid_ts
  FROM bounds),
obs AS (
  SELECT user_id, date_trunc('hour', ts) AS grid_ts, value AS v_obs
  FROM (SELECT *, row_number() OVER (
          PARTITION BY user_id, date_trunc('hour', ts)
          ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
  WHERE rn = 1),
j AS (
  SELECT g.user_id, g.grid_ts, o.v_obs,
    last_value(o.v_obs IGNORE NULLS) OVER (
      PARTITION BY g.user_id ORDER BY g.grid_ts
      ROWS UNBOUNDED PRECEDING) AS v_prev,
    last_value(CASE WHEN o.v_obs IS NOT NULL THEN o.grid_ts END
               IGNORE NULLS) OVER (
      PARTITION BY g.user_id ORDER BY g.grid_ts
      ROWS UNBOUNDED PRECEDING) AS t_prev,
    first_value(o.v_obs IGNORE NULLS) OVER (
      PARTITION BY g.user_id ORDER BY g.grid_ts
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v_next,
    first_value(CASE WHEN o.v_obs IS NOT NULL THEN o.grid_ts END
                IGNORE NULLS) OVER (
      PARTITION BY g.user_id ORDER BY g.grid_ts
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS t_next
  FROM grid g
  LEFT JOIN obs o ON o.user_id = g.user_id AND o.grid_ts = g.grid_ts)
SELECT user_id, grid_ts,
  floor(CASE WHEN v_obs IS NOT NULL THEN v_obs
        ELSE v_prev + (v_next - v_prev)
             * ((epoch_us(grid_ts) - epoch_us(t_prev))::DOUBLE
                / NULLIF((epoch_us(t_next) - epoch_us(t_prev))::DOUBLE,
                         0.0))
        END * 1000000.0 + 0.5)::DOUBLE / 1000000.0 + 0.0 AS v_interp,
  v_obs IS NOT NULL AS is_observed
FROM j
"""


# ---------------------------------------------------------------------------
# Array aggregation surface: collect_set / collect_list with
# deterministic ordering (the engine-portable forms)
# ---------------------------------------------------------------------------

def q_array_agg_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user bucket: the sorted distinct event-type vocabulary and
    the first three event types by time.

    ``collect_set``/``collect_list`` are unordered at scale (partition
    arrival order); the deterministic forms are ``sort_array`` over the
    set and ``array_sort(collect_list(struct(orderkeys…, payload)))``
    with a transform projection — both engine-portable (DuckDB
    ``string_agg(DISTINCT … ORDER BY …)`` / ``list(… ORDER BY …)``).
    Joined to strings so the gate hash covers element order exactly.
    """
    e = t(spark, sf_dir, "events")
    first3 = F.array_join(
        F.slice(
            F.transform(
                F.array_sort(F.collect_list(
                    F.struct("ts", "event_id", "event_type"))),
                lambda s: s["event_type"],
            ),
            1, 3,
        ),
        ",",
    )
    return e.groupBy((F.col("user_id") % 10).alias("user_bucket")).agg(
        F.array_join(F.sort_array(F.collect_set("event_type")), ",")
        .alias("type_vocab"),
        F.count_distinct(F.col("event_type")).alias("n_types"),
        first3.alias("first3_types"),
    )


SQL_ARRAY_AGG_TYPES = """
SELECT user_id % 10 AS user_bucket,
  string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS type_vocab,
  COUNT(DISTINCT event_type) AS n_types,
  array_to_string((list(event_type ORDER BY ts, event_id))[1:3], ',')
    AS first3_types
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Approximate aggregates: HLL distinct + approx percentile — the
# sketch-based forms used at 100 TB where exact distinct/percentile
# shuffles would dominate. Raw sketch outputs are engine-specific, so
# the gates emit exact values plus sketch-vs-exact tolerance booleans
# (the oracle pins exact + TRUE): a sketch drifting past tolerance
# flips a boolean and fails the value hash — the strongest
# cross-engine contract possible for approximate operators.
# ---------------------------------------------------------------------------

def q_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: HyperLogLog++ distinct users (rsd=0.02) and
    approximate p50/p90 of value (accuracy 10000), hash-gated via the
    ``approx_accuracy`` pattern.

    The sketches aggregate map-side into fixed-size state — constant
    shuffle bytes per partition regardless of row count, the whole
    point at scale. Their raw outputs are engine-specific, so the
    output carries the exact answers (distinct users, exact discrete
    p50/p90 via the engine-portable window rank) plus one boolean per
    sketch asserting it landed inside tolerance: HLL within 10% of
    exact (rsd 2% → 5σ headroom), each percentile bracketed by the
    exact ±5-percentile band. ``approx_accuracy`` gates p90+HLL only;
    this is the fuller report (p50 too, plus the exact distinct count
    in-row).
    """
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    pcts = F.percentile_approx("value", [0.5, 0.9], 10000)
    approx = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("au"),
        F.element_at(pcts, 1).alias("ap50"),
        F.element_at(pcts, 2).alias("ap90"),
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n"),
    )
    # exact discrete percentiles via the engine-portable window rank
    w = Window.partitionBy("event_type").orderBy("value")
    ranked = e.filter(F.col("value").isNotNull()).select(
        "event_type", "value", F.row_number().over(w).alias("rk")
    )
    nn = ranked.groupBy("event_type").agg(F.max("rk").alias("nn"))

    def _disc(p):
        return F.min(F.when(
            F.col("rk") == F.ceil(F.lit(p) * F.col("nn")), F.col("value")
        ))

    exact_q = ranked.join(nn, "event_type").groupBy("event_type").agg(
        _disc(0.45).alias("p45"), _disc(0.50).alias("p50"),
        _disc(0.55).alias("p55"), _disc(0.85).alias("p85"),
        _disc(0.90).alias("p90"), _disc(0.95).alias("p95"),
    )
    j = exact.join(exact_q, "event_type").join(approx, "event_type")
    return j.select(
        "event_type", "exact_users", "n", "p50", "p90",
        (F.abs(F.col("au") - F.col("exact_users"))
         / F.col("exact_users") <= 0.10).alias("hll_within_tol"),
        ((F.col("ap50") >= F.col("p45"))
         & (F.col("ap50") <= F.col("p55"))).alias("p50_within_tol"),
        ((F.col("ap90") >= F.col("p85"))
         & (F.col("ap90") <= F.col("p95"))).alias("p90_within_tol"),
    )


SQL_APPROX_STATS = """
WITH exact AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
         COUNT(*) AS n
  FROM events GROUP BY 1),
ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rk
  FROM events WHERE value IS NOT NULL),
nn AS (SELECT event_type, MAX(rk) AS nn FROM ranked GROUP BY 1),
q AS (
  SELECT r.event_type,
    MIN(CASE WHEN rk = CAST(ceil(0.50 * nn) AS BIGINT)
        THEN value END) AS p50,
    MIN(CASE WHEN rk = CAST(ceil(0.90 * nn) AS BIGINT)
        THEN value END) AS p90
  FROM ranked r JOIN nn USING (event_type) GROUP BY 1)
SELECT event_type, exact_users, n, p50, p90,
  TRUE AS hll_within_tol, TRUE AS p50_within_tol,
  TRUE AS p90_within_tol
FROM exact JOIN q USING (event_type)
"""


def q_approx_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch ACCURACY as a value-hash gate: the sketches themselves
    are engine-specific (``approx_stats`` shares this pattern), but
    their error against the exact answers is checkable — Spark
    computes |approx − exact| / exact per group and emits the
    tolerance verdict alongside the exact values; the oracle computes
    the same exact values with literal TRUE verdicts. A sketch
    drifting past tolerance (HLL++ rsd 2% → 10% allowed here;
    percentile rank error ≤ 0.05 → p90 bracketed by exact p85/p95)
    flips a boolean and fails the hash — the strongest cross-engine
    contract possible for approximate operators.
    """
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    pcts = F.percentile_approx("value", [0.9], 10000)
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n"),
    )
    # exact discrete p85/p90/p95 via the engine-portable window rank
    w = Window.partitionBy("event_type").orderBy("value")
    ranked = e.filter(F.col("value").isNotNull()).select(
        "event_type", "value", F.row_number().over(w).alias("rk")
    )
    nn = ranked.groupBy("event_type").agg(F.max("rk").alias("nn"))
    def _disc(p):
        return F.min(F.when(
            F.col("rk") == F.ceil(F.lit(p) * F.col("nn")), F.col("value")
        ))
    exact_q = ranked.join(nn, "event_type").groupBy("event_type").agg(
        _disc(0.85).alias("p85"), _disc(0.90).alias("p90"),
        _disc(0.95).alias("p95"),
    )
    approx = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("au"),
        F.element_at(pcts, 1).alias("ap90"),
    )
    j = exact.join(exact_q, "event_type").join(approx, "event_type")
    return j.select(
        "event_type", "exact_users", "n", "p90",
        (F.abs(F.col("au") - F.col("exact_users"))
         / F.col("exact_users") <= 0.10).alias("hll_within_tol"),
        ((F.col("ap90") >= F.col("p85"))
         & (F.col("ap90") <= F.col("p95"))).alias("p90_within_tol"),
    )


SQL_APPROX_ACCURACY = """
WITH exact AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
         COUNT(*) AS n
  FROM events GROUP BY 1),
ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rk
  FROM events WHERE value IS NOT NULL),
nn AS (SELECT event_type, MAX(rk) AS nn FROM ranked GROUP BY 1),
q AS (
  SELECT r.event_type,
    MIN(CASE WHEN rk = CAST(ceil(0.90 * nn) AS BIGINT)
        THEN value END) AS p90
  FROM ranked r JOIN nn USING (event_type) GROUP BY 1)
SELECT event_type, exact_users, n, p90,
  TRUE AS hll_within_tol, TRUE AS p90_within_tol
FROM exact JOIN q USING (event_type)
"""


def q_group_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per event type — the robust
    dispersion statistic outlier pipelines threshold on (unlike
    stddev, one wild point cannot move it).

    Exact discrete medians via the engine-portable window-rank form
    (H3: no percentile_approx near the gate), both passes + the
    deviation join share the event_type hash partitioning; no
    FP arithmetic beyond one subtraction, so no decimal routing or
    rounding is needed for cross-engine parity.
    """
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value")
    r1 = e.select("event_type", "value",
                  F.row_number().over(w).alias("rk"))
    n1 = r1.groupBy("event_type").agg(F.max("rk").alias("nn"))
    med = (
        r1.join(n1, "event_type")
        .filter(F.col("rk") == F.ceil(F.lit(0.5) * F.col("nn")))
        .groupBy("event_type")
        .agg(F.min("value").alias("med"), F.max("nn").alias("n"))
    )
    dev = e.join(med, "event_type").select(
        "event_type", "med", "n",
        F.abs(F.col("value") - F.col("med")).alias("d"),
    )
    wd = Window.partitionBy("event_type").orderBy("d")
    r2 = dev.select("event_type", "med", "n", "d",
                    F.row_number().over(wd).alias("rk"))
    return (
        r2.filter(F.col("rk") == F.ceil(F.lit(0.5) * F.col("n")))
        .groupBy("event_type")
        .agg(F.max("n").cast("bigint").alias("n"),
             F.max("med").alias("med"),
             F.min("d").alias("mad"))
    )


SQL_GROUP_MAD = """
WITH r1 AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rk
  FROM events WHERE value IS NOT NULL),
n1 AS (SELECT event_type, MAX(rk) AS nn FROM r1 GROUP BY 1),
med AS (
  SELECT r1.event_type, MIN(value) AS med, MAX(nn) AS n
  FROM r1 JOIN n1 USING (event_type)
  WHERE rk = CAST(ceil(0.5 * nn) AS BIGINT)
  GROUP BY 1),
dev AS (
  SELECT e.event_type, med, n, abs(e.value - med) AS d
  FROM events e JOIN med USING (event_type)
  WHERE e.value IS NOT NULL),
r2 AS (
  SELECT event_type, med, n, d,
         row_number() OVER (PARTITION BY event_type ORDER BY d) AS rk
  FROM dev)
SELECT event_type, MAX(n) AS n, MAX(med) AS med, MIN(d) AS mad
FROM r2 WHERE rk = CAST(ceil(0.5 * n) AS BIGINT)
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Heavy-hitter key-skew profile: the diagnosis you run before choosing
# a salting / AQE-skew-join strategy
# ---------------------------------------------------------------------------

SKEW_TOP_K = 10


def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``SKEW_TOP_K`` heaviest join keys with each key's share of
    total rows and the running cumulative share — the skew report
    that decides whether a key needs salting (one dominant key), AQE
    skew-split (a few heavy keys), or nothing (flat tail).

    Scale shape: per-key counts are one map-side-combined hash agg;
    the top-k is TakeOrderedAndProject (never a global sort); the
    total is a 1-row broadcast; shares and the cumulative are
    computed on the k-row result only, so the single-partition window
    touches exactly k rows regardless of corpus size.
    """
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    per_key = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_rows"))
    top = (per_key
           .orderBy(F.col("n_rows").desc(), "user_id")
           .limit(SKEW_TOP_K))
    total = per_key.agg(F.sum("n_rows").alias("total_rows"),
                        F.count(F.lit(1)).alias("n_keys"))
    w = (Window.orderBy(F.col("n_rows").desc(), "user_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        top.join(F.broadcast(total))
        .withColumn("rank", F.row_number().over(
            Window.orderBy(F.col("n_rows").desc(), "user_id")))
        .withColumn("pct_of_total",
                    F.round(F.col("n_rows") / F.col("total_rows") * 100, 6)
                    + F.lit(0.0))
        .withColumn("cum_pct",
                    F.round(F.sum("n_rows").over(w)
                            / F.col("total_rows") * 100, 6) + F.lit(0.0))
        .select("rank", "user_id", "n_rows", "n_keys",
                "pct_of_total", "cum_pct")
    )


SQL_KEY_SKEW_PROFILE = f"""
WITH per_key AS (
  SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY 1),
tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total_rows,
               COUNT(*) AS n_keys FROM per_key),
top AS (
  SELECT user_id, n_rows FROM per_key
  ORDER BY n_rows DESC, user_id LIMIT {SKEW_TOP_K})
SELECT
  CAST(ROW_NUMBER() OVER (ORDER BY n_rows DESC, user_id) AS INT) AS rank,
  user_id, n_rows, n_keys,
  round(n_rows * 100.0 / total_rows, 6) + 0.0 AS pct_of_total,
  round(CAST(SUM(n_rows) OVER (ORDER BY n_rows DESC, user_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) * 100.0 / total_rows, 6)
    + 0.0 AS cum_pct
FROM top, tot
"""


# ---------------------------------------------------------------------------
# Bitwise aggregates: per-user day-of-week activity bitmask — set
# membership compressed to one BIGINT per key
# ---------------------------------------------------------------------------

def q_activity_bitmask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: OR of ``1 << dow`` over their events — seven days of
    membership in one BIGINT — plus the popcount (distinct active
    weekdays) and the XOR fold (odd-occurrence parity mask). The
    bitwise aggregate family: a COUNT(DISTINCT dow) that costs one
    map-side-combinable integer per key instead of a distinct shuffle,
    the trick behind bitmap indexes and roaring-bitmap rollups.

    Scale shape: one hash agg with map-side combine (OR/XOR are
    associative+commutative); no distinct expansion anywhere.
    """
    e = t(spark, sf_dir, "events")
    # python shiftleft() only takes a literal shift; the SQL form
    # accepts a column expression
    mask = F.expr(
        "CAST(shiftleft(1, (dayofweek(ts) + 5) % 7) AS BIGINT)")
    return (
        e.groupBy("user_id")
        .agg(
            F.bit_or(mask).alias("dow_mask"),
            F.bit_count(F.bit_or(mask)).cast("int").alias("n_active_dows"),
            F.bit_xor(mask).alias("parity_mask"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


SQL_ACTIVITY_BITMASK = """
WITH m AS (
  SELECT user_id,
    CAST(1 << ((isodow(ts) - 1)::INT) AS BIGINT) AS mask
  FROM events)
SELECT user_id,
  bit_or(mask) AS dow_mask,
  CAST(bit_count(bit_or(mask)) AS INT) AS n_active_dows,
  bit_xor(mask) AS parity_mask,
  COUNT(*) AS n_events
FROM m GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Bucketed-bitmap exact distinct: Spark's bitmap_construct_agg family
# (the roaring-bitmap pattern) gated by a portable COUNT(DISTINCT)
# oracle on the result
# ---------------------------------------------------------------------------

def q_bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type computed the bitmap way:
    ids bucket into 32k-bit bitmaps (``bitmap_bucket_number`` /
    ``bitmap_bit_position``), each (type, bucket) group ORs its
    bitmap with map-side combine, and the per-bucket popcounts sum —
    COUNT(DISTINCT) without ever shuffling raw id rows, the pattern
    warehouse engines use for incremental distinct rollups (the
    per-bucket bitmaps are also mergeable across days, which a plain
    distinct is not).

    The bitmap machinery is Spark-specific, so the oracle pins the
    RESULT: a plain COUNT(DISTINCT user_id) — if the bitmap path ever
    drops or double-counts an id, the gate hash fails.

    Scale shape: first agg keys on (type, bucket) — cardinality
    |types| × |id-range|/32k, independent of row count — with bitmap
    OR combining map-side; second agg reduces buckets per type.
    """
    e = t(spark, sf_dir, "events")
    per_bucket = (
        e.select("event_type",
                 F.bitmap_bucket_number(F.col("user_id")).alias("bucket"),
                 F.bitmap_bit_position(F.col("user_id")).alias("pos"))
        .groupBy("event_type", "bucket")
        .agg(F.bitmap_count(F.bitmap_construct_agg(F.col("pos")))
             .alias("bucket_distinct"))
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum("bucket_distinct").alias("n_distinct_users"))


SQL_BITMAP_DISTINCT_USERS = """
SELECT event_type,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_users
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Grouped 3-sigma outlier report — variance-form comparison, no sqrt
# ---------------------------------------------------------------------------

def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: how many values sit outside 3σ, and the
    outlier value range. The test is the VARIANCE form
    (v − mean)² > 9·var — algebraically identical to |z| > 3 but with
    no square root, so both engines evaluate the same rational
    arithmetic on identical doubles (mean and var come from exact
    decimal sums; sample variance, n−1).

    Scale shape: two passes over events — one map-side-combined
    moments agg, then the filter with the tiny moments table
    broadcast back. No window, no sort.
    """
    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    mo = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(24,8)"))
        .cast("double").alias("sx"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(38,8)"))
        .cast("double").alias("sxx"))
    nd = F.col("n").cast("double")
    mo = mo.select(
        "event_type", "n",
        (F.col("sx") / nd).alias("mean"),
        ((nd * F.col("sxx") - F.col("sx") * F.col("sx"))
         / (nd * (nd - 1))).alias("var"))
    j = e.join(F.broadcast(mo), "event_type")
    dev = F.col("value") - F.col("mean")
    out = (dev * dev) > F.lit(9.0) * F.col("var")
    return (j.groupBy("event_type").agg(
        F.max("n").alias("n_rows"),
        F.sum(F.when(out, 1).otherwise(0)).alias("n_outliers"),
        F.min(F.when(out, F.col("value"))).alias("min_outlier"),
        F.max(F.when(out, F.col("value"))).alias("max_outlier")))


SQL_VALUE_OUTLIERS = """
WITH e AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
mo AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(24,8))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(value * value AS DECIMAL(38,8))) AS DOUBLE) AS sxx
  FROM e GROUP BY 1),
m2 AS (
  SELECT event_type, n, sx / CAST(n AS DOUBLE) AS mean,
         (CAST(n AS DOUBLE) * sxx - sx * sx)
         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)) AS var
  FROM mo)
SELECT event_type,
       MAX(n) AS n_rows,
       CAST(SUM(CASE WHEN (value - mean) * (value - mean) > 9.0 * var
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       MIN(CASE WHEN (value - mean) * (value - mean) > 9.0 * var
                THEN value END) AS min_outlier,
       MAX(CASE WHEN (value - mean) * (value - mean) > 9.0 * var
                THEN value END) AS max_outlier
FROM e JOIN m2 USING (event_type)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Deterministic train/test split report (portable LCG, no rand())
# ---------------------------------------------------------------------------

TRAIN_PCT = 80


def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (source, split) document and character counts under the
    engine-portable LCG 80/20 split keyed on doc_id — the
    reproducible-split primitive every training pipeline needs
    (rand(seed) is NOT portable across engines or even partitionings;
    the LCG bucket of a stable key is).
    """
    from tpg_weather_etl_spark.operators.sampling import lcg_bucket

    d = t(spark, sf_dir, "documents")
    split = F.when(lcg_bucket(F.col("doc_id")) < TRAIN_PCT,
                   F.lit("train")).otherwise(F.lit("test"))
    return (d.groupBy("source", split.alias("split"))
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("total_chars")))


def _sql_train_test_split() -> str:
    from tpg_weather_etl_spark.operators.sampling import (
        deterministic_sample_sql,
    )
    pred = deterministic_sample_sql("doc_id", TRAIN_PCT)
    return f"""
SELECT source,
       CASE WHEN {pred} THEN 'train' ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1, 2
"""


SQL_TRAIN_TEST_SPLIT = _sql_train_test_split()


# ---------------------------------------------------------------------------
# VARIANT ingestion (Spark 4 semi-structured type)
# ---------------------------------------------------------------------------

def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion through Spark 4's VARIANT type:
    ``parse_json`` decodes the payload once into the binary variant
    encoding, ``variant_get`` probes it with a typed JSONPath — the
    schema-on-read path for payloads too irregular for a fixed
    ``from_json`` schema (the sibling `json_extract` covers the
    schema-full path). The gate proves the VARIANT decode agrees
    with the oracle's plain json_extract_string.

    Scale shape: per-row JVM decode inside codegen, then a ~10-key
    map-side-combined hash agg; nothing grows with the corpus except
    the scan.
    """
    e = t(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return (e.select(k.alias("k"), "value", "event_type")
            .groupBy(F.expr("k DIV 10").cast("int").alias("k_bucket"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.countDistinct("event_type").alias("n_types"),
                 _dsum(F.col("value")).alias("value_sum")))


SQL_VARIANT_EXTRACT = """
WITH p AS (SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
                  value, event_type
           FROM events)
SELECT CAST(k // 10 AS INTEGER) AS k_bucket,
       COUNT(*) AS n,
       COUNT(DISTINCT event_type) AS n_types,
       CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(24,8))), 4)
            AS DECIMAL(18,4)) AS DOUBLE) AS value_sum
FROM p
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Event-type transition matrix (first-order Markov estimate)
# ---------------------------------------------------------------------------

def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P(next event type | current type) per user-ordered event
    stream — the first-order Markov behavioural profile (funnel
    analysis's continuous cousin). LEAD over the per-user order gives
    the bigram; the probability is each bigram count over its row
    total, computed as one double division of exact bigints and
    rounded to 6.

    Scale shape: the lead window and nothing else shuffles the events
    (by user_id); the bigram agg map-side combines into a
    type²-bounded table, and the per-from total joins broadcast.
    """
    e = t(spark, sf_dir, "events")
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    bi = (e.select("event_type",
                   F.lead("event_type").over(w).alias("next_type"))
          .filter(F.col("next_type").isNotNull()))
    counts = (bi.groupBy("event_type", "next_type")
              .agg(F.count("*").alias("n")))
    totals = counts.groupBy("event_type").agg(
        F.sum("n").alias("tot"))
    return (counts.join(F.broadcast(totals), "event_type")
            .select("event_type", "next_type", "n",
                    (F.round(F.col("n").cast("double")
                             / F.col("tot").cast("double"), 6)
                     + F.lit(0.0)).alias("p")))


SQL_EVENT_TRANSITIONS = """
WITH bi AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events),
counts AS (
  SELECT event_type, next_type, COUNT(*) AS n
  FROM bi WHERE next_type IS NOT NULL
  GROUP BY 1, 2),
totals AS (
  SELECT event_type, CAST(SUM(n) AS BIGINT) AS tot
  FROM counts GROUP BY 1)
SELECT event_type, next_type, n,
       round(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6) + 0.0 AS p
FROM counts JOIN totals USING (event_type)
"""


# ---------------------------------------------------------------------------
# Sequence-completeness audit: missing-id ranges via distributed LEAD
# ---------------------------------------------------------------------------

GAP_DROP_MODULUS = 97


def q_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-id ranges in the event_id sequence — the
    "did-we-lose-records" audit every CDC/ingest pipeline runs. Every
    id divisible by 97 is dropped first (the testdata sequence is
    complete; the deterministic drop simulates loss), then each
    surviving id's successor comes from ``global_lead``
    (operators/prefix.py) — LEAD(1) over a global order WITHOUT the
    single-partition window a plain ``LEAD() OVER (ORDER BY ...)``
    forces, so the audit runs at any id-space size.

    Oracle: the plain single-window LEAD — proving the two-level
    boundary stitch exactly.
    """
    from tpg_weather_etl_spark.operators.prefix import global_lead

    ids = (t(spark, sf_dir, "events")
           .filter(F.col("event_id") % GAP_DROP_MODULUS != 0)
           .select("event_id").distinct())
    led = global_lead(ids, ["event_id"], "event_id", out_col="next_id")
    return (led.filter((F.col("next_id") - F.col("event_id")) > 1)
            .select((F.col("event_id") + 1).alias("gap_start"),
                    (F.col("next_id") - 1).alias("gap_end"),
                    (F.col("next_id") - F.col("event_id") - 1)
                    .alias("n_missing")))


SQL_SEQUENCE_GAPS = f"""
WITH ids AS (
  SELECT DISTINCT event_id FROM events
  WHERE event_id % {GAP_DROP_MODULUS} <> 0),
led AS (
  SELECT event_id,
         lead(event_id) OVER (ORDER BY event_id) AS next_id
  FROM ids)
SELECT event_id + 1 AS gap_start,
       next_id - 1 AS gap_end,
       next_id - event_id - 1 AS n_missing
FROM led
WHERE next_id - event_id > 1
"""


def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per event type: clip values at the exact
    discrete p05/p95 (H3 quantile semantics) then average — the
    robust-location statistic that survives sensor spikes without
    discarding rows (trimming's information-losing cousin).

    Scale shape: the quantile window and the clip join share the
    event_type hash partitioning (the group_mad discipline); the
    clipped mean routes through the decimal sum so summation order
    cannot move the hash."""
    from tpg_weather_etl_spark.operators.quantiles import (
        with_group_quantiles,
    )

    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bounds = with_group_quantiles(
        e, ["event_type"], "value",
        {"p05": 0.05, "p95": 0.95},
        extra_aggs=[F.count(F.lit(1)).alias("n")])
    clipped = e.join(bounds, "event_type").select(
        "event_type", "n", "p05", "p95",
        F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
        .alias("cv"),
        (F.col("value") < F.col("p05")).cast("long").alias("lo"),
        (F.col("value") > F.col("p95")).cast("long").alias("hi"),
    )
    return (
        clipped.groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.max("p05").alias("p05"),
            F.max("p95").alias("p95"),
            (F.round(_dsum(F.col("cv")) / F.max("n"), 6) + F.lit(0.0))
            .alias("winsorized_mean"),
            F.sum("lo").alias("n_clipped_low"),
            F.sum("hi").alias("n_clipped_high"),
        )
        .orderBy("event_type")
    )


SQL_WINSORIZED_STATS = """
WITH e AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
b AS (
  SELECT event_type,
    QUANTILE(value, 0.05) AS p05,
    QUANTILE(value, 0.95) AS p95,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM e GROUP BY event_type),
c AS (
  SELECT e.event_type, b.n, b.p05, b.p95,
    LEAST(GREATEST(e.value, b.p05), b.p95) AS cv,
    CASE WHEN e.value < b.p05 THEN 1 ELSE 0 END AS lo,
    CASE WHEN e.value > b.p95 THEN 1 ELSE 0 END AS hi
  FROM e JOIN b USING (event_type))
SELECT event_type, MAX(n) AS n, MAX(p05) AS p05, MAX(p95) AS p95,
  round(CAST(CAST(ROUND(SUM(CAST(cv AS DECIMAL(24,8))), 4)
        AS DECIMAL(18,4)) AS DOUBLE) / MAX(n), 6) + 0.0
    AS winsorized_mean,
  CAST(SUM(lo) AS BIGINT) AS n_clipped_low,
  CAST(SUM(hi) AS BIGINT) AS n_clipped_high
FROM c GROUP BY event_type ORDER BY event_type
"""


def q_source_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov–Smirnov distance between each source's document-
    length distribution and the corpus's — the third drift flavor
    next to token-space KL (source_kl_drift) and embedding-space
    cosine (centroid_shift): a purely numeric-marginal monitor that
    catches truncation bugs and boilerplate floods that keep the
    vocabulary intact.

    Exact: both ECDFs are evaluated on the full grid of corpus-
    distinct lengths (the KS max occurs at an observed point), built
    as distinct-values × sources — bounded because the length domain
    is; for an unbounded metric, bucket x first. The cumulative sums
    are windows over that small grid (never the corpus), partitioned
    by source; all ratios are exact-integer rationals, rounded at 6dp
    before the max."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents").select("source", "n_chars")
    csx = d.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).alias("c_sx"))
    cx = d.groupBy("n_chars").agg(F.count(F.lit(1)).alias("c_x"))
    ns = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    n = d.agg(F.count(F.lit(1)).alias("n"))
    grid = (
        ns.crossJoin(F.broadcast(cx))
        .join(csx, ["source", "n_chars"], "left")
        .fillna({"c_sx": 0})
        .crossJoin(F.broadcast(n))
    )
    w = (Window.partitionBy("source").orderBy("n_chars")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ecdf = grid.select(
        "source", "n_s",
        (F.sum("c_sx").over(w) / F.col("n_s").cast("double"))
        .alias("f_s"),
        (F.sum("c_x").over(w) / F.col("n").cast("double")).alias("f"),
    )
    return (
        ecdf.groupBy("source")
        .agg(
            F.max("n_s").alias("n_docs"),
            (F.round(F.max(F.round(F.abs(F.col("f_s") - F.col("f")), 6)),
                     6) + F.lit(0.0)).alias("ks"),
        )
        .orderBy(F.desc("ks"), "source")
    )


SQL_SOURCE_KS_DRIFT = """
WITH d AS (SELECT source, n_chars FROM documents),
csx AS (SELECT source, n_chars, COUNT(*) AS c_sx FROM d GROUP BY 1, 2),
cx AS (SELECT n_chars, COUNT(*) AS c_x FROM d GROUP BY 1),
ns AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s FROM d GROUP BY 1),
n AS (SELECT COUNT(*) AS n FROM d),
grid AS (
  SELECT ns.source, ns.n_s, cx.n_chars, cx.c_x,
         COALESCE(csx.c_sx, 0) AS c_sx, n.n
  FROM ns CROSS JOIN cx
  LEFT JOIN csx ON csx.source = ns.source AND csx.n_chars = cx.n_chars
  CROSS JOIN n),
ecdf AS (
  SELECT source, n_s,
    SUM(c_sx) OVER (PARTITION BY source ORDER BY n_chars
                    ROWS UNBOUNDED PRECEDING) / CAST(n_s AS DOUBLE)
      AS f_s,
    SUM(c_x) OVER (PARTITION BY source ORDER BY n_chars
                   ROWS UNBOUNDED PRECEDING) / CAST(n AS DOUBLE) AS f
  FROM grid)
SELECT source, MAX(n_s) AS n_docs,
  round(MAX(round(abs(f_s - f), 6)), 6) + 0.0 AS ks
FROM ecdf GROUP BY source ORDER BY ks DESC, source
"""


def q_chi2_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence audit of the source × lang contingency
    table — the standard "is language balance uniform across sources"
    check a mixing pipeline runs before trusting per-source language
    quotas. Emits one row per cell with observed/expected and the
    cell's chi-square contribution, plus the table-level statistic
    broadcast onto every row (self-contained audit report).

    Determinism: observed and marginal counts are exact integers;
    expected = row·col/N is one double division; contributions are
    rounded at 6dp and decimal-summed for the total. Scale: one
    groupBy of the corpus on the two columns; everything after is
    dictionary-sized (|sources|×|langs|)."""
    from pyspark import StorageLevel

    from tpg_weather_etl_spark.caching import track

    d = t(spark, sf_dir, "documents").select("source", "lang")
    # the contingency table is dictionary-sized and consumed by four
    # branches (marginals, total, grid) — persist it so the corpus
    # groupBy happens once
    o = track(
        d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("obs"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    rs = o.groupBy("source").agg(F.sum("obs").alias("row_n"))
    cs = o.groupBy("lang").agg(F.sum("obs").alias("col_n"))
    n = o.agg(F.sum("obs").alias("n"))
    # the full grid, so structurally-zero cells contribute their
    # expected mass (omitting them understates the statistic)
    grid = (rs.crossJoin(F.broadcast(cs))
            .join(o, ["source", "lang"], "left")
            .fillna({"obs": 0})
            .crossJoin(F.broadcast(n)))
    e = (F.col("row_n") * F.col("col_n")) / F.col("n").cast("double")
    contrib = F.round((F.col("obs") - e) * (F.col("obs") - e) / e, 6)
    cells = grid.select(
        "source", "lang", "obs",
        (F.round(e, 6) + F.lit(0.0)).alias("expected"),
        (contrib + F.lit(0.0)).alias("chi2_contrib"),
        contrib.cast("decimal(24,8)").alias("__c"),
    )
    total = cells.agg(
        (F.round(F.sum("__c"), 6).cast("double") + F.lit(0.0))
        .alias("chi2_total"))
    return (
        cells.drop("__c").crossJoin(F.broadcast(total))
        .orderBy("source", "lang")
    )


SQL_CHI2_SOURCE_LANG = """
WITH o AS (SELECT source, lang, COUNT(*) AS obs FROM documents
           GROUP BY 1, 2),
rs AS (SELECT source, SUM(obs) AS row_n FROM o GROUP BY 1),
cs AS (SELECT lang, SUM(obs) AS col_n FROM o GROUP BY 1),
n AS (SELECT SUM(obs) AS n FROM o),
grid AS (
  SELECT rs.source, cs.lang, rs.row_n, cs.col_n,
         COALESCE(o.obs, 0) AS obs, n.n
  FROM rs CROSS JOIN cs
  LEFT JOIN o ON o.source = rs.source AND o.lang = cs.lang
  CROSS JOIN n),
cells AS (
  SELECT source, lang, CAST(obs AS BIGINT) AS obs,
    round((row_n * col_n) / CAST(n AS DOUBLE), 6) + 0.0 AS expected,
    round((obs - (row_n * col_n) / CAST(n AS DOUBLE))
          * (obs - (row_n * col_n) / CAST(n AS DOUBLE))
          / ((row_n * col_n) / CAST(n AS DOUBLE)), 6) AS contrib
  FROM grid),
tot AS (
  SELECT CAST(ROUND(SUM(CAST(contrib AS DECIMAL(24,8))), 6) AS DOUBLE)
         + 0.0 AS chi2_total
  FROM cells)
SELECT source, lang, obs, expected, contrib + 0.0 AS chi2_contrib,
       chi2_total
FROM cells CROSS JOIN tot ORDER BY source, lang
"""


QUERIES = {
    "winsorized_stats": q_winsorized_stats,
    "source_ks_drift": q_source_ks_drift,
    "chi2_source_lang": q_chi2_source_lang,
    "sequence_gaps": q_sequence_gaps,
    "event_transitions": q_event_transitions,
    "variant_extract": q_variant_extract,
    "value_outliers": q_value_outliers,
    "train_test_split": q_train_test_split,
    "activity_bitmask": q_activity_bitmask,
    "bitmap_distinct_users": q_bitmap_distinct_users,
    "key_skew_profile": q_key_skew_profile,
    "scalar_normalize": q_scalar_normalize,
    "array_agg_types": q_array_agg_types,
    "approx_stats": q_approx_stats,
    "approx_accuracy": q_approx_accuracy,
    "group_mad": q_group_mad,
    "session_window_agg": q_session_window_agg,
    "pattern_within": q_pattern_within,
    "numeric_profile": q_numeric_profile,
    "sliding_window_counts": q_sliding_window_counts,
    "daily_value_quantiles": q_daily_value_quantiles,
    "scd2_intervals": q_scd2_intervals,
    "weighted_sample_topk": q_weighted_sample_topk,
    "gap_fill_forward": q_gap_fill_forward,
    "gap_fill_interpolate": q_gap_fill_interpolate,
    "json_extract": q_json_extract,
    "contains_filter": q_contains_filter,
    "union_shards": q_union_shards,
    "heatmap_hour_dow": q_heatmap_hour_dow,
    "kpi_summary": q_kpi_summary,
    "sessionize": q_sessionize,
    "cohort_retention": q_cohort_retention,
    "funnel_steps": q_funnel_steps,
}

ORACLE = {
    "winsorized_stats": SQL_WINSORIZED_STATS,
    "source_ks_drift": SQL_SOURCE_KS_DRIFT,
    "chi2_source_lang": SQL_CHI2_SOURCE_LANG,
    "sequence_gaps": SQL_SEQUENCE_GAPS,
    "event_transitions": SQL_EVENT_TRANSITIONS,
    "variant_extract": SQL_VARIANT_EXTRACT,
    "value_outliers": SQL_VALUE_OUTLIERS,
    "train_test_split": SQL_TRAIN_TEST_SPLIT,
    "activity_bitmask": SQL_ACTIVITY_BITMASK,
    "bitmap_distinct_users": SQL_BITMAP_DISTINCT_USERS,
    "key_skew_profile": SQL_KEY_SKEW_PROFILE,
    "scalar_normalize": SQL_SCALAR_NORMALIZE,
    "json_extract": SQL_JSON_EXTRACT,
    "gap_fill_forward": SQL_GAP_FILL_FORWARD,
    "gap_fill_interpolate": SQL_GAP_FILL_INTERPOLATE,
    "array_agg_types": SQL_ARRAY_AGG_TYPES,
    "approx_accuracy": SQL_APPROX_ACCURACY,
    "group_mad": SQL_GROUP_MAD,
    "session_window_agg": SQL_SESSION_WINDOW_AGG,
    "pattern_within": SQL_PATTERN_WITHIN,
    "numeric_profile": SQL_NUMERIC_PROFILE,
    "sliding_window_counts": SQL_SLIDING_WINDOW_COUNTS,
    "daily_value_quantiles": SQL_DAILY_VALUE_QUANTILES,
    "scd2_intervals": SQL_SCD2_INTERVALS,
    "weighted_sample_topk": SQL_WEIGHTED_SAMPLE_TOPK,
    "approx_stats": SQL_APPROX_STATS,
    "contains_filter": SQL_CONTAINS_FILTER,
    "union_shards": SQL_UNION_SHARDS,
    "heatmap_hour_dow": SQL_HEATMAP_HOUR_DOW,
    "kpi_summary": SQL_KPI_SUMMARY,
    "sessionize": SQL_SESSIONIZE,
    "cohort_retention": SQL_COHORT_RETENTION,
    "funnel_steps": SQL_FUNNEL_STEPS,
}
