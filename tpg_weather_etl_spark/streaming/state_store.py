"""Streaming state-store provider selection — the 100 TB state knob.

The default ``HDFSBackedStateStoreProvider`` keeps EVERY key's state
as JVM objects on the executor heap (one in-memory map per state
partition, plus recent versions retained for snapshotting). That is
the right choice for the repo's small keyed streams (per-line EWMA:
hundreds of keys), but it is an OOM at training-corpus cardinality —
a streaming dedup or per-document state operator over billions of
keys cannot hold its store in heap, and heap pressure from state
competes directly with shuffle/exec memory.

``RocksDBStateStoreProvider`` (bundled with Spark since 3.2; public
API, configured entirely through SQL conf) moves the working state to
an embedded RocksDB on executor LOCAL DISK with a bounded off-heap
block cache, so state size is limited by disk, not heap. With
changelog checkpointing the per-batch commit uploads only the batch's
delta to the checkpoint location instead of a full snapshot —
commit cost tracks BATCH size, not STORE size, which is the same
flat-per-batch contract SCALE.md rule 14 measures for the dedup
store layout.

Scope contract (why this is a helper, not a session default):

- The provider is fixed PER CHECKPOINT: Spark validates the provider
  class against what the checkpoint was created with, so flipping the
  conf under an existing checkpoint fails the query rather than
  corrupting state. Choose per pipeline, at first deployment.
- The conf is read at QUERY START: calling these helpers affects
  queries started afterwards on this session; running queries are
  untouched.
- Reference parity: the reference is strictly batch (SURVEY §2.9);
  this module, like the rest of streaming/, is the §7.5 extension,
  so the knob follows Spark's own public configuration surface
  rather than any reference analogue.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
DEFAULT_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)
_CHANGELOG_CONF = ("spark.sql.streaming.stateStore.rocksdb."
                   "changelogCheckpointing.enabled")
_BOUNDED_MEM_CONF = ("spark.sql.streaming.stateStore.rocksdb."
                     "boundedMemoryUsage")
_MAX_MEM_CONF = ("spark.sql.streaming.stateStore.rocksdb."
                 "maxMemoryUsageMB")


def use_rocksdb_state_store(
    spark: SparkSession,
    *,
    changelog_checkpointing: bool = True,
    bounded_memory_mb: int | None = None,
) -> SparkSession:
    """Select RocksDB state for queries started after this call.

    ``changelog_checkpointing=True`` makes per-batch checkpoint
    commits upload the batch DELTA rather than a store snapshot
    (snapshots still happen, asynchronously, for recovery bound) —
    without it, commit latency grows with store size and the flat
    per-batch contract breaks exactly where RocksDB matters.

    ``bounded_memory_mb`` caps the total RocksDB block-cache +
    memtable usage across ALL state partitions on an executor
    (Spark's boundedMemoryUsage mode). Leave None to accept
    per-instance defaults; set it when executors host many state
    partitions (high ``spark.sql.shuffle.partitions``).
    """
    spark.conf.set(PROVIDER_CONF, ROCKSDB_PROVIDER)
    spark.conf.set(_CHANGELOG_CONF,
                   "true" if changelog_checkpointing else "false")
    if bounded_memory_mb is not None:
        spark.conf.set(_BOUNDED_MEM_CONF, "true")
        spark.conf.set(_MAX_MEM_CONF, str(int(bounded_memory_mb)))
    return spark


def use_default_state_store(spark: SparkSession) -> SparkSession:
    """Restore the heap-backed default provider (small-state paths,
    and test isolation — the suite's session is shared)."""
    spark.conf.set(PROVIDER_CONF, DEFAULT_PROVIDER)
    try:
        spark.conf.unset(_CHANGELOG_CONF)
        spark.conf.unset(_BOUNDED_MEM_CONF)
        spark.conf.unset(_MAX_MEM_CONF)
    except Exception:
        pass
    return spark


def current_provider(spark: SparkSession) -> str:
    """The provider queries started NOW would use (conf or default)."""
    return spark.conf.get(PROVIDER_CONF, DEFAULT_PROVIDER)
