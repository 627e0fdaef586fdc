"""Incremental ingestion (Structured Streaming wrapper).

The reference is strictly request/response + batch files (SURVEY.md §2.10)
and the north rule is a batch spark-submit job; incremental re-processing is
primarily handled by the checkpoint/lineage resume algebra
(pipeline/checkpoint.py). This module additionally provides a Structured
Streaming front-end for continuously-arriving page files: readStream ->
the SAME narrow tagging pipeline -> foreachBatch exactly-once append with
lineage rows, so a long-running ingest and the batch backfill share one
code path.
"""

from unsupervised_ner_spark.streaming.ingest import stream_pages  # noqa: F401
