"""Degenerate-dimension guard for embedding z-score normalization
(ADVICE r3: v<=0 made Spark silently drop the element while DuckDB
raised — engines must instead agree on an explicit 'null')."""

from __future__ import annotations

import duckdb
import pytest


@pytest.fixture(scope="module")
def degen_sf_dir(spark, tmp_path_factory):
    """embeddings table where dim 1 is CONSTANT (v=0) across vectors."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("degen_sf")
    vecs = []
    for i in range(8):
        # keep |x| small like the real testdata: the oracle's exact
        # DECIMAL(18,8) square overflows int64 for |x| ≳ 3
        v = [float(i + j) * 0.02 for j in range(64)]
        v[1] = 0.5  # zero-variance dimension
        vecs.append(v)
    table = pa.table({
        "vec_id": pa.array(range(8), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([i % 2 for i in range(8)], pa.int64()),
    })
    out = root / "embeddings.parquet"
    out.mkdir()
    pq.write_table(table, str(out / "part-0.parquet"))
    return str(root)


def test_constant_dim_renders_null_not_dropped(spark, degen_sf_dir):
    from tpg_weather_etl_spark.queries_ml import q_embedding_zscore

    rows = q_embedding_zscore(spark, degen_sf_dir).collect()
    assert len(rows) == 8
    for r in rows:
        parts = r.zvec.split(",")
        assert len(parts) == 64          # nothing silently dropped
        assert parts[1] == "null"        # degenerate dim is explicit
        assert all(p != "null" for p in parts[2:])


def test_constant_dim_oracle_agrees(spark, degen_sf_dir):
    from tpg_weather_etl_spark.queries_ml import (
        SQL_EMBEDDING_ZSCORE,
        q_embedding_zscore,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{degen_sf_dir}/embeddings.parquet/*.parquet')"
    )
    # the oracle must RUN on degenerate data (not raise on CAST(inf))
    oracle = {r[0]: r[1]
              for r in con.execute(SQL_EMBEDDING_ZSCORE).fetchall()}
    got = {r.vec_id: r.zvec
           for r in q_embedding_zscore(spark, degen_sf_dir).collect()}
    assert got == oracle
