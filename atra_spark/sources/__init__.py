"""Sources: deterministic fixture synthesis, seeds, and the
parquet-backed checkpoint table store (Iceberg stand-in)."""
