"""Cost-based optimizer awareness: ANALYZE TABLE column statistics
flow into plan cardinality estimates.

At cluster scale, CBO cardinalities drive join reordering and
broadcast decisions; this pins the machinery end-to-end — create a
table, ANALYZE ... FOR ALL COLUMNS, and check the optimizer's
row-count estimate for a selective filter is the histogram-accurate
one (not a guess from file size)."""

from __future__ import annotations


def test_analyze_stats_drive_cardinality_estimates(spark, tmp_path):
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        spark.sql(
            "CREATE TABLE t_cbo_test (k INT, v DOUBLE) USING parquet "
            f"LOCATION '{tmp_path}/t1'")
        spark.sql("INSERT OVERWRITE t_cbo_test "
                  "SELECT id AS k, id * 1.0 AS v FROM range(1000)")
        spark.sql(
            "ANALYZE TABLE t_cbo_test COMPUTE STATISTICS FOR ALL COLUMNS")

        df = spark.table("t_cbo_test").filter("k < 100")
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        assert stats.rowCount().isDefined(), (
            "ANALYZE column stats did not reach the optimizer")
        est = int(str(stats.rowCount().get()))
        # histogram-based estimate for k < 100 over uniform 0..999:
        # ~100 rows; anything within 2x proves the stats are used
        # (a size-only guess would be the full 1000)
        assert 50 <= est <= 200, est
    finally:
        spark.sql("DROP TABLE IF EXISTS t_cbo_test")
        spark.conf.set("spark.sql.cbo.enabled", "false")


def test_cbo_reorders_six_table_star(spark, tmp_path):
    """EXPLAIN COST proof that ANALYZE stats reach JOIN REORDERING on
    the local_supplier_volume 6-table star: with CBO + joinReorder the
    optimizer rebuilds the join tree from the selective end
    (region-filtered nation) instead of the literal lineitem-first
    FROM order, and every join node carries a rowCount estimate."""
    import re

    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    tables = ["region", "nation", "customer", "supplier",
              "orders", "lineitem"]
    try:
        for tbl in tables:
            spark.read.parquet(
                f"/root/testdata/sf0.001/{tbl}.parquet"
            ).write.option("path", f"{tmp_path}/{tbl}").saveAsTable(
                f"cbo_{tbl}")
            spark.sql(f"ANALYZE TABLE cbo_{tbl} "
                      "COMPUTE STATISTICS FOR ALL COLUMNS")
        sql = """
            SELECT n_name, SUM(l_extendedprice * (1 - l_discount)) AS rev
            FROM cbo_lineitem
            JOIN cbo_orders ON l_orderkey = o_orderkey
            JOIN cbo_customer ON o_custkey = c_custkey
            JOIN cbo_supplier ON l_suppkey = s_suppkey
                             AND c_nationkey = s_nationkey
            JOIN cbo_nation ON s_nationkey = n_nationkey
            JOIN cbo_region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
            GROUP BY 1"""
        qe = spark.sql(sql)._jdf.queryExecution()
        opt = qe.optimizedPlan()

        # stats propagate through all 5 joins to the root: the
        # estimate is #nations-in-region, not a size-derived guess
        assert opt.stats().rowCount().isDefined()
        assert int(str(opt.stats().rowCount().get())) <= 25

        # the reordered tree starts from the selective dimension end
        order = re.findall(r"cbo_(\w+)", opt.toString())
        assert order.index("region") < order.index("lineitem"), order
        assert order.index("nation") < order.index("orders"), order

        # joinReorder actually changed the shape vs the literal order
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
        plain = spark.sql(sql)._jdf.queryExecution().optimizedPlan()
        order_plain = re.findall(r"cbo_(\w+)", plain.toString())
        assert order_plain[0] == "lineitem", order_plain
        assert order != order_plain

        # EXPLAIN COST surface: every Join operator carries Statistics
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        with_stats = qe.stringWithStats()
        joins = [ln for ln in with_stats.splitlines() if "Join Inner" in ln]
        assert len(joins) == 5
        assert all("rowCount=" in ln for ln in joins), with_stats
    finally:
        for tbl in tables:
            spark.sql(f"DROP TABLE IF EXISTS cbo_{tbl}")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
        spark.conf.set("spark.sql.cbo.enabled", "false")
