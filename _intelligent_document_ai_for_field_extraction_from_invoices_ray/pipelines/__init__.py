"""End-to-end pipelines: flagship extraction, evaluation, relational
operators, dedup, text statistics and similarity search."""
