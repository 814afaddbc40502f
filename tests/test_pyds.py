"""Spark 4 Python DataSource: determinism + partition-planning tests."""

from __future__ import annotations


def _load(spark, rows, parts, seed=42):
    from tpg_weather_etl_spark.sources.pyds import SyntheticEventsDataSource
    spark.dataSource.register(SyntheticEventsDataSource)
    return (spark.read.format("synthetic_events")
            .option("rows", rows).option("partitions", parts)
            .option("seed", seed).load())


def test_synthetic_source_deterministic_and_partitioned(spark):
    a = _load(spark, 500, 4).collect()
    b = _load(spark, 500, 4).collect()
    assert sorted(a) == sorted(b)
    assert len(a) == 500
    assert len({r.event_id for r in a}) == 500


def test_synthetic_source_layout_independent(spark):
    # same (rows, seed) must produce identical content for ANY
    # partition count — the generator is keyed by global row id
    a = {tuple(r) for r in _load(spark, 300, 2).collect()}
    b = {tuple(r) for r in _load(spark, 300, 7).collect()}
    assert a == b


def test_synthetic_source_partition_count(spark):
    df = _load(spark, 1000, 8)
    assert df.rdd.getNumPartitions() == 8
