"""Incremental streaming corpus dedup: duplicates are dropped both
within a micro-batch and across separately-triggered runs (the
fingerprint store survives restarts because it IS the output)."""

from __future__ import annotations

import json

from tpg_weather_etl_spark.streaming.corpus_dedup import (

    stream_documents,
    write_stream_dedup,
)
from stream_utils import await_or_fail


def _doc(doc_id, text, source="web"):
    return json.dumps({"doc_id": doc_id, "text": text, "lang": "en",
                       "source": source, "n_chars": len(text)})


def _run_available(spark, inbox, out, ckpt):
    q = write_stream_dedup(
        stream_documents(spark, str(inbox), max_files_per_trigger=1),
        str(out), str(ckpt)).start()
    await_or_fail(q, 600)


def test_stream_dedup_in_and_cross_batch(spark, tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    out, ckpt = tmp_path / "corpus", tmp_path / "ckpt"

    # wave 1: "hello world" repeats within the batch (whitespace-
    # normalized dup) — lowest doc_id wins per fingerprint
    (inbox / "a.jsonl").write_text("\n".join([
        _doc(1, "hello world"),
        _doc(2, "hello   WORLD"),      # same fingerprint as doc 1
        _doc(3, "fresh content"),
    ]))
    _run_available(spark, inbox, out, ckpt)
    assert {r.doc_id for r in spark.read.parquet(str(out)).collect()} \
        == {1, 3}

    # wave 1b: separate trigger run — doc 4 duplicates doc 1, which is
    # already in the store (first arrival wins across batches)
    (inbox / "b.jsonl").write_text("\n".join([
        _doc(4, "hello world"),        # cross-batch dup of doc 1
        _doc(5, "another document"),
    ]))
    _run_available(spark, inbox, out, ckpt)
    rows = {r.doc_id: r.fp
            for r in spark.read.parquet(str(out)).collect()}
    assert set(rows) == {1, 3, 5}

    # wave 2: NEW trigger run (restart) — store must persist
    (inbox / "c.jsonl").write_text("\n".join([
        _doc(6, "Hello  World"),       # dup of doc 1 across runs
        _doc(7, "brand new"),
    ]))
    _run_available(spark, inbox, out, ckpt)

    rows = {r.doc_id for r in spark.read.parquet(str(out)).collect()}
    assert rows == {1, 3, 5, 7}


def test_stream_dedup_missing_store_raises_on_real_read_error(spark, tmp_path):
    # absence is fine (first batch) ...
    from tpg_weather_etl_spark.streaming.corpus_dedup import _path_exists
    assert not _path_exists(spark, str(tmp_path / "nope"))
    # ... but a store that exists and is unreadable must raise, not
    # silently skip the anti-join and admit duplicates
    bad = tmp_path / "corpus_bad"
    bad.mkdir()
    (bad / "part-00000.parquet").write_text("this is not parquet")
    assert _path_exists(spark, str(bad))
    import pytest as _pytest
    with _pytest.raises(Exception):
        spark.read.parquet(str(bad)).select("fp").collect()


def test_stream_dedup_bucketed_store(spark, tmp_path):
    """store_table variant: same dedup semantics, store bucketed on fp."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    ckpt = tmp_path / "ckpt"
    table = "corpus_dedup_store_t"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        (inbox / "a.jsonl").write_text("\n".join([
            _doc(1, "hello world"),
            _doc(2, "hello   WORLD"),
            _doc(3, "fresh content"),
        ]))
        q = write_stream_dedup(
            stream_documents(spark, str(inbox), max_files_per_trigger=1),
            str(tmp_path / "unused"), str(ckpt), store_table=table,
            num_buckets=8).start()
        await_or_fail(q, 600)
        # the stream's microbatches run in a cloned session whose
        # catalog-cache refresh doesn't reach this session — external
        # readers of an appended table refresh, per normal Spark
        # semantics (within the stream itself the clone's own refresh
        # keeps batch N+1's anti-join consistent with batch N's append)
        spark.catalog.refreshTable(table)
        assert {r.doc_id for r in spark.table(table).collect()} == {1, 3}

        (inbox / "b.jsonl").write_text("\n".join([
            _doc(4, "hello world"),       # cross-batch dup
            _doc(5, "another document"),
        ]))
        q = write_stream_dedup(
            stream_documents(spark, str(inbox), max_files_per_trigger=1),
            str(tmp_path / "unused"), str(ckpt), store_table=table,
            num_buckets=8).start()
        await_or_fail(q, 600)
        spark.catalog.refreshTable(table)
        assert {r.doc_id for r in spark.table(table).collect()} == {1, 3, 5}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def _find_scan_path(node, table_name, path=()):
    """Root→leaf path to the FileScan of ``table_name`` in a JVM plan."""
    path = path + (node,)
    cls = node.getClass().getSimpleName()
    if cls == "FileSourceScanExec" and table_name in node.toString():
        return path
    ch = node.children()
    for i in range(ch.size()):
        found = _find_scan_path(ch.apply(i), table_name, path)
        if found:
            return found
    return None


def test_bucketed_store_anti_join_no_exchange_on_store_side(spark, tmp_path):
    """The scale claim, mechanically: with the store bucketed on fp,
    the per-batch anti-join plan has NO Exchange anywhere between the
    join and the store scan — only the (small) batch side shuffles."""
    from tpg_weather_etl_spark.sources.writers import write_bucketed
    from tpg_weather_etl_spark.streaming.corpus_dedup import (
        DOC_SCHEMA, batch_new_documents, doc_fingerprint)
    from pyspark.sql import functions as F

    table = "corpus_plan_proof_t"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # AQE wraps the tree in an opaque AdaptiveSparkPlanExec; disable
    # it so the walker sees the physical tree (the Exchange-placement
    # decision under test is made by EnsureRequirements either way)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # The no-shuffle-on-store guarantee requires bucket count >= the
    # batch side's shuffle parallelism: if the batch arrives hash-
    # partitioned WIDER than the bucket count, Spark reshuffles the
    # bucketed side up to match instead (observed: 8 buckets vs 32
    # shuffle partitions -> store Exchange). At warehouse scale the
    # store is written with buckets >= expected per-batch parallelism;
    # pin the conf here to encode that sizing rule.
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        store = spark.createDataFrame(
            [(i, f"doc number {i}", "en", "web", 20) for i in range(500)],
            DOC_SCHEMA).withColumn("fp", doc_fingerprint(F.col("text")))
        write_bucketed(store, table, ["fp"], num_buckets=8,
                       sort_cols=["fp"], mode="overwrite")
        batch = spark.createDataFrame(
            [(1000 + i, f"doc number {i * 3}", "en", "web", 20)
             for i in range(50)], DOC_SCHEMA)
        out = batch_new_documents(
            batch, spark.table(table).select("fp"))
        root = out._jdf.queryExecution().executedPlan()
        scan_path = _find_scan_path(root, table)
        assert scan_path is not None, root.toString()
        exchanges = [n for n in scan_path
                     if "Exchange" in n.getClass().getSimpleName()]
        assert not exchanges, root.toString()
        # and the dedup is still right: docs 0,3,...,147 collide
        kept = {r.doc_id for r in out.collect()}
        assert kept == {1000 + i for i in range(50) if i * 3 >= 500}
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def _local_path(location: str) -> str:
    """file:/x or file:///x URI -> /x (the suite runs on local FS)."""
    if location.startswith("file:"):
        location = location[len("file:"):]
        while location.startswith("//"):
            location = location[1:]
    return location


def _plant_orphan_store(spark, table: str) -> set[int]:
    """Create exactly the state a killed run leaves behind: committed
    bucketed store data under the managed location, NO catalog entry.
    Returns the doc_ids the orphaned store already holds."""
    import shutil
    from pathlib import Path

    from pyspark.sql import functions as F

    from tpg_weather_etl_spark.sources.writers import (
        managed_table_location, write_bucketed)
    from tpg_weather_etl_spark.streaming.corpus_dedup import (
        DOC_SCHEMA, doc_fingerprint)

    seed = table + "_seed"
    spark.sql(f"DROP TABLE IF EXISTS {seed}")
    store = spark.createDataFrame(
        [(1, "hello world", "en", "web", 11),
         (3, "fresh content", "en", "web", 13)],
        DOC_SCHEMA).withColumn("fp", doc_fingerprint(F.col("text")))
    write_bucketed(store, seed, ["fp"], num_buckets=8,
                   sort_cols=["fp"], mode="overwrite")
    src = Path(_local_path(managed_table_location(spark, seed)))
    dst = Path(_local_path(managed_table_location(spark, table)))
    if dst.exists():
        shutil.rmtree(dst)
    shutil.copytree(src, dst)
    spark.sql(f"DROP TABLE IF EXISTS {seed}")
    return {1, 3}


def test_stream_dedup_bucketed_store_orphan_recovery(spark, tmp_path):
    """VERDICT r12 #1: a managed location whose catalog entry died
    with a previous session (or a crash between write and catalog
    commit) must not brick the store. Replay must (a) not crash with
    LOCATION_ALREADY_EXISTS and (b) anti-join against the ORPHANED
    data — ignoring it would re-admit every duplicate the dead run
    already suppressed."""
    import shutil
    from pathlib import Path

    from tpg_weather_etl_spark.sources.writers import (
        managed_table_location)

    table = "corpus_dedup_orphan_t"
    loc = Path(_local_path(managed_table_location(spark, table)))
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if loc.exists():
        shutil.rmtree(loc)
    try:
        orphan_ids = _plant_orphan_store(spark, table)
        assert loc.exists() and not spark.catalog.tableExists(table)

        inbox = tmp_path / "inbox"
        inbox.mkdir()
        (inbox / "a.jsonl").write_text("\n".join([
            _doc(4, "hello   WORLD"),   # dup of orphaned doc 1
            _doc(5, "another document"),
        ]))
        q = write_stream_dedup(
            stream_documents(spark, str(inbox), max_files_per_trigger=1),
            str(tmp_path / "unused"), str(tmp_path / "ckpt"),
            store_table=table, num_buckets=8).start()
        await_or_fail(q, 600)
        spark.catalog.refreshTable(table)
        assert ({r.doc_id for r in spark.table(table).collect()}
                == orphan_ids | {5})
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        # the repaired table is external: DROP leaves the data — clear
        # it so this test can't itself orphan the next run
        if loc.exists():
            shutil.rmtree(loc)


def test_repair_orphaned_table_policies(spark, tmp_path):
    """The repair helper's non-happy paths: registered table and
    absent location are no-ops; a location holding only uncommitted
    debris (crash before first job commit) is cleared, not
    registered."""
    import shutil
    from pathlib import Path

    from tpg_weather_etl_spark.sources.writers import (
        managed_table_location, repair_orphaned_table, write_bucketed)

    # registered table -> no-op
    t_reg = "repair_policy_reg_t"
    spark.sql(f"DROP TABLE IF EXISTS {t_reg}")
    write_bucketed(spark.range(5).withColumnRenamed("id", "k"),
                   t_reg, ["k"], num_buckets=2, mode="overwrite")
    try:
        assert repair_orphaned_table(spark, t_reg, ["k"], 2) is False
        assert spark.table(t_reg).count() == 5
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_reg}")

    # absent location -> no-op
    assert repair_orphaned_table(spark, "repair_policy_absent_t") is False

    # only uncommitted debris -> location cleared, nothing registered
    t_dbg = "repair_policy_debris_t"
    loc = Path(_local_path(managed_table_location(spark, t_dbg)))
    if loc.exists():
        shutil.rmtree(loc)
    (loc / "_temporary" / "0").mkdir(parents=True)
    (loc / "_SUCCESS").write_text("")
    assert repair_orphaned_table(spark, t_dbg) is False
    assert not spark.catalog.tableExists(t_dbg)
    assert not loc.exists()


def test_repair_refuses_unclassifiable_layouts(spark):
    """ADVICE r13 (medium): the debris-clearing branch used to
    recursively delete ANY location without top-level parquet — a
    partitioned table's committed data (which lives one directory
    down, under ``month=…``) would have been silently destroyed. The
    helper must refuse what it cannot prove is uncommitted debris."""
    import shutil
    from pathlib import Path

    import pytest

    from tpg_weather_etl_spark.sources.writers import (
        managed_table_location, repair_orphaned_table)

    # partition-style subdirectory with committed data below
    t_part = "repair_policy_partitioned_t"
    loc = Path(_local_path(managed_table_location(spark, t_part)))
    if loc.exists():
        shutil.rmtree(loc)
    part = loc / "month=2020-01"
    part.mkdir(parents=True)
    (part / "part-00000.snappy.parquet").write_bytes(b"PAR1")
    (loc / "_SUCCESS").write_text("")
    try:
        with pytest.raises(ValueError, match="refusing to clear"):
            repair_orphaned_table(spark, t_part)
        # the data must be untouched by the refusal
        assert (part / "part-00000.snappy.parquet").exists()
    finally:
        shutil.rmtree(loc)

    # foreign non-parquet file: equally unclassifiable -> refuse
    t_csv = "repair_policy_foreign_t"
    loc = Path(_local_path(managed_table_location(spark, t_csv)))
    if loc.exists():
        shutil.rmtree(loc)
    loc.mkdir(parents=True)
    (loc / "data.csv").write_text("k,v\n1,2\n")
    try:
        with pytest.raises(ValueError, match="refusing to clear"):
            repair_orphaned_table(spark, t_csv)
        assert (loc / "data.csv").exists()
    finally:
        shutil.rmtree(loc)


def test_managed_table_location_uses_current_database(spark):
    """ADVICE r13: after USE mydb, saveAsTable writes an unqualified
    name under <wh>/mydb.db/<name>; the location helper must resolve
    against the session's current database or orphan repair targets
    the wrong path."""
    from tpg_weather_etl_spark.sources.writers import (
        managed_table_location)

    db = "mtl_probe_db"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    try:
        spark.catalog.setCurrentDatabase(db)
        loc = managed_table_location(spark, "t1")
        assert loc.endswith(f"{db}.db/t1"), loc
        # explicit qualification still wins over the current database
        loc_q = managed_table_location(spark, "default.t1")
        assert loc_q.endswith("/t1") and not loc_q.endswith(".db/t1")
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    # back in default: flat path directly under the warehouse dir
    wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    assert managed_table_location(spark, "t2") == f"{wh}/t2"
