"""Streaming near-duplicate ingest: every micro-batch is screened against
an ACCUMULATING banded MinHash-LSH index (the stored dedup index
``ops/dedup.banded_signatures`` defines) via ``foreachBatch``, and only
admitted documents extend the index — the streaming composition of
incremental_dedup. This is what a 100 TB crawl pipeline runs continuously:
the index is the only long-lived state, it grows with ADMITTED distinct
content (not arrivals), and it lives in storage, not executor memory.

Exactly-once discipline (the standard foreachBatch recipe): both sinks —
the per-batch decision table and the index extension — are written as
``batch=<id>`` / ``src_batch=<id>`` subdirectories with mode=overwrite, so
a replayed micro-batch (crash between the two writes, restart re-delivers
the same batch_id) OVERWRITES its own partial output instead of appending
a duplicate. The index read inside the screen EXCLUDES the current
batch_id for the same reason: a replay must not see its own first
attempt's partial index rows. ``test_lsh_ingest_replay_idempotent`` calls
the batch function twice with one batch_id and asserts byte-identical
final state.

Within-stream semantics match incremental_dedup: admit iff the doc
near-duplicates neither the index (content admitted by EARLIER batches)
nor a smaller-id doc in its own batch. The bucket cap is a FIXED
parameter, not corpus-adaptive — a per-batch adaptive cap would make
admit decisions depend on where micro-batch boundaries fell, breaking
replay determinism.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unsupervised_ner_spark.ops.dedup import (
    banded_signatures,
    screen_batch_against_index,
)
from unsupervised_ner_spark.streaming.stateful import DOCS_SCHEMA

LSH_INGEST_CAP = 200


def _empty_index(spark) -> DataFrame:
    return spark.createDataFrame(
        [], "doc_id long, band_id int, band_hash string, src_batch long"
    )


def read_index(spark, index_dir: str, exclude_batch: int | None = None) -> DataFrame:
    """The accumulated band index (empty-safe). ``exclude_batch`` drops
    rows a replay of that batch may have half-written."""
    if not os.path.isdir(index_dir) or not any(
        f.endswith(".parquet") or f.startswith("src_batch=")
        for f in os.listdir(index_dir)
    ):
        return _empty_index(spark)
    idx = spark.read.option("basePath", index_dir).parquet(index_dir)
    if exclude_batch is not None:
        idx = idx.filter(F.col("src_batch") != exclude_batch)
    return idx.select("doc_id", "band_id", "band_hash", "src_batch")


def process_ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    index_dir: str,
    num_hashes: int = 8,
    band_size: int = 2,
    k: int = 3,
    max_bucket: int = LSH_INGEST_CAP,
) -> None:
    """The foreachBatch body, exposed as a plain function so idempotency is
    unit-testable without a streaming runtime. Writes
    ``out_dir/batch=<id>/`` (full decision table for the batch) and
    ``index_dir/src_batch=<id>/`` (admitted docs' bands), both overwrite."""
    from unsupervised_ner_spark.caching import cache_scope

    spark = batch_df.sparkSession
    # one scope per micro-batch: the screen's internal persists (banded
    # batch table) release when both sinks are written — a long-running
    # stream must not accumulate one persisted table per batch
    with cache_scope():
        batch_df = batch_df.select("doc_id", "text")
        index = read_index(spark, index_dir, exclude_batch=batch_id).drop(
            "src_batch"
        )
        decisions = screen_batch_against_index(
            batch_df, index, num_hashes, band_size, k, max_bucket
        )
        decisions.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

        # re-read the committed decision table so the index extension
        # derives from the SAME materialization the audit trail shows (not
        # a second evaluation of a nondeterministic-in-principle plan)
        committed = spark.read.parquet(f"{out_dir}/batch={batch_id}")
        admitted_docs = batch_df.join(
            committed.filter(F.col("admit")).select("doc_id"), "doc_id"
        )
        banded_signatures(admitted_docs, num_hashes, band_size, k).withColumn(
            "src_batch", F.lit(batch_id).cast("long")
        ).write.mode("overwrite").parquet(f"{index_dir}/src_batch={batch_id}")


def stream_lsh_ingest(
    spark: Any,
    src_dir: str,
    out_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    max_bucket: int = LSH_INGEST_CAP,
):
    """File-source document stream -> per-micro-batch LSH screen against
    the accumulated index -> decision table + index extension. Returns the
    started StreamingQuery (availableNow trigger). Restart-safe: offsets
    live in ``checkpoint_dir``; both sinks are per-batch overwrites (see
    module docstring)."""

    def _proc(bdf: DataFrame, bid: int) -> None:
        process_ingest_batch(bdf, bid, out_dir, index_dir, max_bucket=max_bucket)

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(src_dir)
    )
    return (
        stream.writeStream.foreachBatch(_proc)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
