"""Connected-components + cluster summary operator tests
(operators/graph.py) — including the bounded-members guarantee for
boilerplate mega-clusters."""

from __future__ import annotations

from pyspark.sql import functions as F

from tpg_weather_etl_spark.operators.graph import (
    MEMBER_SAMPLE_N,
    cluster_summary,
    connected_components_min_label,
)


def test_cc_two_components(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10)],
        "doc_a long, doc_b long",
    )
    labels = connected_components_min_label(edges)
    got = {(r.doc, r.cluster) for r in labels.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (12, 10)}


def test_cluster_summary_bounds_members_on_mega_cluster(spark):
    """A 10^5-member star cluster must yield ONE summary row whose
    members field holds only MEMBER_SAMPLE_N ids — not a straggler row
    carrying the full membership (r2/r3 verdict task)."""
    n = 100_000
    edges = spark.range(1, n).select(
        F.lit(0).alias("doc_a"), F.col("id").alias("doc_b"))
    labels = connected_components_min_label(edges)
    rows = cluster_summary(labels).collect()
    assert len(rows) == 1
    row = rows[0]
    assert row.cluster_id == 0
    assert row.cluster_size == n
    # members is the stringified bounded list: 0..MEMBER_SAMPLE_N-1
    ids = [int(x) for x in
           row.members.strip("[]").replace(",", " ").split()]
    assert ids == list(range(MEMBER_SAMPLE_N))
    # and the row itself stays driver-sized
    assert len(row.members) < 10_000


def test_cluster_summary_small_cluster_members_complete(spark):
    """Below the bound, members lists every id (sorted)."""
    edges = spark.createDataFrame(
        [(5, 9), (9, 7)], "doc_a long, doc_b long")
    labels = connected_components_min_label(edges)
    row = cluster_summary(labels).collect()[0]
    assert row.cluster_size == 3
    ids = [int(x) for x in
           row.members.strip("[]").replace(",", " ").split()]
    assert ids == [5, 7, 9]
