"""Sources — Parquet page readers and deterministic synthetic corpora."""
