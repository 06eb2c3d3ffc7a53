"""Storage layer — snapshot-committed parquet tables (snaptable)."""
