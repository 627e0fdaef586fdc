"""Spark DataFrame pipeline stages: pages -> sentences -> mentions -> typed
-> tags -> triples -> canonical graph tables.

Design rule (SURVEY.md §4.3): everything up to triple assembly is a NARROW
map over pages — zero shuffles. Per-mention aggregation happens inside the
Arrow-batched tagging UDF (the typing math is keyed per mention, so a
groupBy would be a pointless exchange). Shuffles appear only where the
semantics are genuinely cross-row: entity resolution, canonicalization,
connected components, and the final sink partitioning.
"""
