"""Large-scale training-data pipeline operators (BASELINE.json north star):
deduplication, similarity search, text analysis, multimodal column plumbing.
All built on the same relational core as the reference-parity kernels and
designed for 100 TB inputs (documented per function)."""
