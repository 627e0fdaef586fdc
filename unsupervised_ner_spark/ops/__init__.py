"""Large-scale training-data-pipeline operators over the corpus tables.

Beyond the reference's own pipeline stages, these are the operations a
100 TB web-text ingestion needs (dedup, similarity search, text analysis,
multimodal plumbing). Every operator is declarative-first; hash primitives
are md5-based so the DuckDB oracle can replay them bit-identically.
"""
