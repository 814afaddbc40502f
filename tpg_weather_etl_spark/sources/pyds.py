"""Spark 4 Python DataSource — a deterministic synthetic event
generator registered as a first-class readable format.

Demonstrates the ``pyspark.sql.datasource`` API surface: schema
declaration, option handling, partition planning, and per-partition
Arrow-batched generation. The generator is the portable LCG used by
the sampling operators, keyed by (seed, partition, row), so the same
options always produce the same table on any cluster layout — the
property a load-test/backfill source must have.

Usage:
    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
          .option("rows", 1000).option("partitions", 8)
          .option("seed", 42).load())
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2_147_483_648  # 2^31


def _lcg(x: int) -> int:
    return (x * _LCG_A + _LCG_C) % _LCG_M


class SyntheticEventsDataSource(DataSource):
    """format("synthetic_events"): deterministic seeded event rows."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, value double"

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.rows = int(options.get("rows", 1000))
        self.n_parts = max(1, int(options.get("partitions", 4)))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition):
        pid = partition.value
        # contiguous row ranges per partition; the generator is keyed
        # by the GLOBAL row id, so values are independent of n_parts
        per = -(-self.rows // self.n_parts)
        lo = pid * per
        hi = min(self.rows, lo + per)
        for rid in range(lo, hi):
            h = _lcg(self.seed * 2_654_435_761 + rid)
            # high-bit extraction, not `h % k`: with a power-of-two
            # modulus the LCG's low bits are weak — h's parity tracks
            # rid's, so `% 1000` made user_id parity a pure function
            # of row parity (see operators/sampling.py:lcg_bucket,
            # same fix)
            user = (h * 1000) // _LCG_M
            h2 = _lcg(h)
            value = ((h2 * 100_000) // _LCG_M) / 100.0
            yield (rid, user, value)
