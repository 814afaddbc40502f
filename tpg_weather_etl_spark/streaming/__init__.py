"""Structured Streaming variants (no reference counterpart — SURVEY
§2.9 records the reference as strictly batch; this is the §7.5
extension for streaming IstDaten ingest)."""
