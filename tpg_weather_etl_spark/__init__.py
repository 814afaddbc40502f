"""tpg_weather_etl_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query & data-processing
capabilities of the reference repo AurelK7/tpg_weather_etl
(batch ETL + analytics over GTFS / IstDaten / MeteoSwiss data,
DuckDB + pandas) as an idiomatic Spark DataFrame engine, plus the
large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) such an engine needs
at 100 TB scale.

Layout
------
- ``session``    : SparkSession factory (UTC, AQE, zstd, dynamic overwrite)
- ``schemas``    : StructTypes mirroring the reference warehouse DDL
- ``functions/`` : column-expression "macro" layer (no UDFs in hot paths)
- ``operators/`` : reusable relational operators (priority dedupe,
                   as-of join, discrete quantiles, rolling windows,
                   similarity/dedup, deterministic sampling)
- ``sources/``   : readers (csv/zip staging) and writers (partitioned
                   parquet, dynamic-overwrite upserts)
- ``ingest/``    : GTFS / IstDaten / weather ingest pipelines
- ``features/``  : gold feature builders (events, by_stop_line,
                   training_row)
- ``streaming/`` : Structured Streaming variants
- ``plans/``     : plan-inspection helpers (explain audits)
"""

__version__ = "0.1.0"
