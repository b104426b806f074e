"""Sources: parquet/CSV/JSON readers and deterministic synthetic generators."""
