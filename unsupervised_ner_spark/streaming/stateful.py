"""Custom stateful streaming operator: incremental canonical-entity counts.

``applyInPandasWithState`` keeps a per-(etype, norm_surface) running mention
count across micro-batches — the streaming twin of the batch ER exact-
canonical aggregate (pipeline/er.py:exact_canonical): as pages stream in,
each entity's global mention count updates incrementally instead of
re-aggregating the corpus. State survives restarts through the stream's
checkpointLocation, so an interrupted ingest resumes exactly.

Scale posture: state is partitioned by the group key (the same key the
batch aggregate shuffles on); per-key state is one long. At 10^12 pages the
state store is bounded by the number of DISTINCT canonical surfaces, not by
corpus size, and hot keys ("covid") are single-state-row updates, not
shuffle skew.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("etype", T.StringType()),
        T.StructField("norm_surface", T.StringType()),
        T.StructField("n_mentions", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType([T.StructField("n", T.LongType())])


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    new = sum(len(pdf) for pdf in pdfs)
    total = (state.get[0] if state.exists else 0) + new
    state.update((total,))
    yield pd.DataFrame(
        {"etype": [key[0]], "norm_surface": [key[1]], "n_mentions": [total]}
    )


def running_entity_counts(mentions: DataFrame) -> DataFrame:
    """Streaming mentions(etype, norm_surface, ...) -> updated running
    totals per canonical entity, one row per updated key per trigger."""
    return mentions.groupBy("etype", "norm_surface").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


MENTIONS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("etype", T.StringType()),
        T.StructField("norm_surface", T.StringType()),
    ]
)


def stream_entity_counts(
    spark: Any,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """File-source stream of mention rows -> stateful running counts
    appended per epoch to parquet (update rows; the CURRENT count per key is
    the row with the highest epoch). Returns the started StreamingQuery;
    operator state resumes from ``checkpoint_dir`` across restarts
    (exactly-once counts over an at-least-once source — memory sinks cannot
    recover state, foreachBatch can)."""
    stream = (
        spark.readStream.schema(MENTIONS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(src_dir)
    )
    counts = running_entity_counts(stream)

    def sink(batch_df, epoch_id: int) -> None:
        from pyspark.sql import functions as F

        batch_df.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(out_dir)

    return (
        counts.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def current_counts(spark: Any, out_dir: str) -> DataFrame:
    """Latest running total per (etype, norm_surface) from the epoch-
    appended update rows."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.read.parquet(out_dir)
    w = Window.partitionBy("etype", "norm_surface").orderBy(
        F.desc("epoch"), F.desc("n_mentions")
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("etype", "norm_surface", "n_mentions")
    )


# ---------------------------------------------------------------------------
# streaming first-seen dedup
# ---------------------------------------------------------------------------

DEDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fingerprint", T.StringType()),
    ]
)
DEDUP_STATE_SCHEMA = T.StructType([T.StructField("rep_doc", T.LongType())])

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _dedup_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        # fingerprint already admitted in an earlier micro-batch: every
        # arrival is a duplicate — emit nothing, keep the original owner
        return
    ids = pd.concat(list(pdfs))["doc_id"]
    rep = int(ids.min())  # deterministic within the admitting batch
    state.update((rep,))
    yield pd.DataFrame({"doc_id": [rep], "fingerprint": [key[0]]})


def first_seen_docs(fingerprinted: DataFrame) -> DataFrame:
    """Streaming (doc_id, fingerprint) -> exactly ONE row per distinct
    fingerprint over the stream's lifetime: the first-seen document (min
    doc_id within the admitting micro-batch). The training-data-pipeline
    "drop already-seen documents on ingest" primitive — the streaming twin
    of ops/dedup.exact_dup_groups's representative choice.

    Scale posture: state is one long per DISTINCT fingerprint (bounded by
    unique content, not corpus size), partitioned on the same key the
    batch dedup aggregate shuffles on; a hot fingerprint (viral boilerplate
    re-crawled 10^6 times) is a single state row consulted per batch, not
    a shuffle-skew key."""
    return fingerprinted.groupBy("fingerprint").applyInPandasWithState(
        _dedup_update,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_first_seen(
    spark: Any,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """File-source stream of documents -> fingerprint (same md5-normalized
    key as the batch path) -> first-seen filter -> parquet append. Returns
    the started StreamingQuery; the seen-set survives restarts through
    ``checkpoint_dir``, so a re-run admits no duplicate of anything
    admitted before the interruption."""
    from unsupervised_ner_spark.ops.textstats import fingerprint

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(src_dir)
    )
    survivors = first_seen_docs(fingerprint(stream))
    return (
        survivors.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
