"""TIMESTAMP_NTZ tolerance regression tests.

Round 3 post-mortem: the driver's pyspark 4.1.2 reads the testdata's
timezone-less parquet ``timestamp[us]`` as ``TIMESTAMP_NTZ`` (NTZ
inference on by default), and every strictly-typed ``F.unix_micros``
call site failed analysis with DATATYPE_MISMATCH — breaking
interval_join, pattern_within, rolling_7d, sessionize, the bench run,
and masking the same latent pattern in asof_join / training_row.

These tests recreate the hostile environment on purpose: they write an
events-shaped parquet whose ``ts`` is NTZ-typed and read it back with
``spark.sql.parquet.inferTimestampNTZ.enabled=true`` (the opposite of
our session default), then run every query that does epoch arithmetic.
``epoch_us`` (functions/time.py) must absorb the type difference; the
answers must equal the LTZ reading of the same file byte-for-byte
(lossless because the session timezone is pinned UTC, hazard H1).
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from tpg_weather_etl_spark.functions.time import epoch_us
from tpg_weather_etl_spark.operators.ranges import interval_join

NTZ_CONF = "spark.sql.parquet.inferTimestampNTZ.enabled"


@pytest.fixture(scope="module")
def ntz_sf_dir(spark, tmp_path_factory):
    """events-shaped parquet whose ts is timezone-less ``timestamp[us]``.

    Written with pyarrow, NOT Spark: Spark embeds its own schema in the
    parquet footer metadata and honors it on read, which would defeat
    the NTZ-inference conf this suite exercises. The driver's testdata
    is pyarrow/duckdb-written (no Spark metadata, isAdjustedToUTC
    unset), so this reproduces the round-3 environment exactly.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("ntz_sf")
    base = dt.datetime(2024, 3, 1, 8, 0, 0)
    rows = []
    for uid in range(5):
        for i in range(40):
            # gaps alternate 5 min / 45 min → multiple sessions per user
            minutes = i * 5 + (i // 7) * 45
            rows.append((
                uid * 1000 + i,
                base + dt.timedelta(minutes=minutes, seconds=uid),
                uid,
                ["click", "purchase", "view", "signup"][i % 4],
                float(i) * 3.5,  # tops out >99: interval_join's gate
                                 # filters purchases on value > 99.0
                '{"k": %d}' % i,
            ))
    table = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string()),
    })
    out = root / "events.parquet"
    out.mkdir()
    pq.write_table(table, str(out / "part-0.parquet"))
    return str(root)


def _with_ntz_inference(spark, enabled: bool):
    spark.conf.set(NTZ_CONF, "true" if enabled else "false")


def _read_ts_type(spark, sf_dir):
    return dict(
        spark.read.parquet(f"{sf_dir}/events.parquet").dtypes)["ts"]


def _run_both(spark, sf_dir, q):
    """Run q with NTZ inference ON, then OFF; return both sorted rows."""
    prior = spark.conf.get(NTZ_CONF, "false")
    try:
        _with_ntz_inference(spark, True)
        assert _read_ts_type(spark, sf_dir) == "timestamp_ntz", \
            "fixture failed to produce an NTZ read"
        ntz_rows = [tuple(map(str, r)) for r in q(spark, sf_dir).collect()]
        _with_ntz_inference(spark, False)
        assert _read_ts_type(spark, sf_dir) == "timestamp"
        ltz_rows = [tuple(map(str, r)) for r in q(spark, sf_dir).collect()]
    finally:
        spark.conf.set(NTZ_CONF, prior)
    return sorted(ntz_rows), sorted(ltz_rows)


def test_epoch_us_accepts_both_timestamp_flavors(spark):
    df = spark.range(1).select(
        F.lit("2024-03-01 08:00:00").cast("timestamp").alias("ltz"),
        F.lit("2024-03-01 08:00:00").cast("timestamp_ntz").alias("ntz"),
    )
    row = df.select(
        epoch_us(F.col("ltz")).alias("a"),
        epoch_us(F.col("ntz")).alias("b"),
    ).first()
    assert row.a == row.b  # lossless under UTC session tz


@pytest.mark.parametrize("qname", [
    "rolling_7d", "sessionize", "pattern_within", "interval_join",
])
def test_ntz_queries_run_and_match_ltz(spark, ntz_sf_dir, qname):
    from tpg_weather_etl_spark.registry import all_queries
    q = all_queries()[qname]
    ntz_rows, ltz_rows = _run_both(spark, ntz_sf_dir, q)
    assert len(ntz_rows) > 0
    assert ntz_rows == ltz_rows


def test_ntz_asof_and_training_row_windows(spark, ntz_sf_dir):
    """asof_join range form + the training_row window pattern on NTZ."""
    prior = spark.conf.get(NTZ_CONF, "false")
    try:
        _with_ntz_inference(spark, True)
        e = spark.read.parquet(f"{ntz_sf_dir}/events.parquet")
        from pyspark.sql import Window
        from tpg_weather_etl_spark.operators.asof import asof_join

        left = e.select("event_id", "user_id", "ts")
        right = e.filter(F.col("event_type") == "purchase").select(
            "user_id",
            F.col("ts").alias("obs_ts"),
            F.col("value").alias("obs_value"),
        )
        out = asof_join(left, right, "ts", "obs_ts", on=["user_id"],
                        tolerance_minutes=120)
        assert out.count() == left.count()

        w = (Window.partitionBy("user_id")
             .orderBy(epoch_us(F.col("ts")))
             .rangeBetween(-86400 * 1_000_000, 0))
        rolled = e.select(
            "event_id", F.count(F.lit(1)).over(w).alias("n_1d"))
        assert rolled.count() == e.count()
    finally:
        spark.conf.set(NTZ_CONF, prior)


def test_read_table_normalizes_ntz_at_boundary(spark, ntz_sf_dir):
    """read_table must hand every query an LTZ ts even when the
    ambient session forces NTZ inference — the boundary guarantee the
    whole registry relies on."""
    from tpg_weather_etl_spark.sources.tables import read_table

    prior = spark.conf.get(NTZ_CONF, "false")
    try:
        _with_ntz_inference(spark, True)
        assert _read_ts_type(spark, ntz_sf_dir) == "timestamp_ntz"
        df = read_table(spark, ntz_sf_dir, "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
    finally:
        spark.conf.set(NTZ_CONF, prior)


def test_interval_join_malformed_intervals_yield_no_bins(spark):
    """end < start must produce ZERO join rows, not a descending
    F.sequence explosion (ADVICE r3 medium, operators/ranges.py)."""
    pts = spark.createDataFrame(
        [(1, dt.datetime(2024, 3, 1, 9, 0, 0))], "pid long, ts timestamp")
    good = (10, dt.datetime(2024, 3, 1, 8, 0, 0),
            dt.datetime(2024, 3, 1, 10, 0, 0))
    # malformed: ends 3 DAYS before it starts — unguarded, this would
    # explode to thousands of descending bins
    bad = (11, dt.datetime(2024, 3, 1, 8, 0, 0),
           dt.datetime(2024, 2, 27, 8, 0, 0))
    ivs = spark.createDataFrame(
        [good, bad], "iid long, w_start timestamp, w_end timestamp")
    out = interval_join(pts, ivs, "ts", "w_start", "w_end",
                        bin_seconds=600).collect()
    assert [r.iid for r in out] == [10]
