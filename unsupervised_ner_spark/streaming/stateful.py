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


# ---------------------------------------------------------------------------
# streaming sessionization (event-time gap + state timeout)
# ---------------------------------------------------------------------------

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_ms", T.LongType()),
        T.StructField("session_end_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

SESSION_GAP_MS = 30 * 60 * 1000


def _session_row(key: tuple, sess: tuple) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [key[0]],
            "session_start_ms": [sess[0]],
            "session_end_ms": [sess[1]],
            "n_events": [sess[2]],
        }
    )


def _session_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # watermark passed last_event + gap with no new arrivals: the
        # session is CLOSED — emit the finalized row and drop the state
        sess = tuple(state.get)
        state.remove()
        yield _session_row(key, sess)
        return
    batch = pd.concat(list(pdfs))
    ts_ms = sorted(int(t) for t in batch["ts"].astype("int64") // 1_000_000)
    # in-batch gaps-and-islands: split the sorted arrivals on > gap
    sessions: list[list[int]] = []  # [start, end, n]
    for t in ts_ms:
        if sessions and t - sessions[-1][1] <= SESSION_GAP_MS:
            sessions[-1][1] = t
            sessions[-1][2] += 1
        else:
            sessions.append([t, t, 1])
    if state.exists:
        start_ms, end_ms, n = state.get
        first = sessions[0]
        if first[0] <= end_ms + SESSION_GAP_MS:
            # contiguous with (or late-inside) the open session: fold in
            first[0] = min(first[0], start_ms)
            first[1] = max(first[1], end_ms)
            first[2] += n
        else:
            # the open session's gap elapsed in event time even though
            # the timeout hadn't fired yet (a later event arrived first):
            # close it ahead of the new ones
            sessions.insert(0, [start_ms, end_ms, n])
    # everything but the newest session is closed by construction
    for sess in sessions[:-1]:
        yield _session_row(key, tuple(sess))
    last = sessions[-1]
    state.update((last[0], last[1], last[2]))
    # close when the WATERMARK (not wall clock) passes end + gap — the
    # event-time semantics of the batch gaps-and-islands twin. Timeouts
    # must be set strictly beyond the current watermark.
    wm = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(last[1] + SESSION_GAP_MS, wm + 1))


def sessionize_events(events: DataFrame) -> DataFrame:
    """Streaming (user_id, ts) -> one row per CLOSED session (start, end,
    event count), a session being a maximal run of a user's events with
    no gap > 30 min — the streaming twin of the batch gaps-and-islands
    sessionization (rel_window_sessions): instead of a corpus-wide
    window-lag pass, each user's open session is one bounded state row
    that closes either by EVENT-TIME timeout (watermark passes its last
    event + gap with no arrivals) or eagerly when a later event proves
    the gap elapsed; arrivals within a trigger are gap-split in-batch
    (the same gaps-and-islands rule, applied to the sorted micro-batch).

    Scale posture: state is (3 longs) x (users with an OPEN session) —
    bounded by active users, not event volume; the state store partitions
    on user_id, the key the batch window would shuffle on anyway. Late
    events inside the watermark merge into the open session; events later
    than the watermark are dropped upstream by the watermark filter (the
    windowed-counts late-drop semantics, restart-safe through the
    checkpoint)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_update,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_sessions(
    spark: Any,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """File-source stream of (user_id, ts) events -> closed-session rows
    appended to parquet. Returns the started StreamingQuery; open-session
    state survives restarts through ``checkpoint_dir`` (a session spanning
    an interruption closes exactly once, with events from both runs)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    return (
        sessionize_events(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
