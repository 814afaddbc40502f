"""Ingest pipelines: GTFS timetables, IstDaten realized events,
MeteoSwiss weather — DataFrame re-expressions of the reference's
pandas+DuckDB ETL (src/01*, 02*, 03*)."""
