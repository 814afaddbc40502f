"""Sources & sinks: table readers, CSV/ZIP staging, partitioned writers."""

from tpg_weather_etl_spark.sources.tables import read_table  # noqa: F401
