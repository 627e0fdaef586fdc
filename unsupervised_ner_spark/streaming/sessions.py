"""Event-time SESSION windows — gap-based sessionization of crawl
activity (Structured Streaming built-in ``session_window``; the last
windowing primitive the streaming surface lacked next to the fixed
windows in windowed.py).

``sessionized_host_activity`` groups per-host fetch events into sessions
that extend while consecutive events arrive within ``gap`` of each other
and close once a quiet period >= ``gap`` elapses.  Unlike fixed windows,
session windows MERGE at runtime: an event landing between two open
sessions of the same host fuses them into one, so the state store must
support range merges — Spark's session-window state operator does this
natively; hand-rolling it with applyInPandasWithState would re-implement
interval coalescing per key.

With a watermark, a session is finalized (emitted exactly once in append
mode) when the watermark passes ``session_end``; rows arriving later than
the watermark cannot reopen an emitted session — same late-data contract
as windowed.py, extended to dynamic window bounds.

Scale posture: state is one (start, end, agg) range per OPEN session per
host — bounded by active hosts, not corpus size; the shuffle key is the
host, so a hot crawl frontier host is one reducer key (agg skew, not a
join explosion).  The gap parameter bounds session length only
indirectly; a pathological host that never goes quiet keeps one
ever-growing session row open — callers at 100 TB/day cap that with an
upstream fixed-window pre-split or a max-session-length policy, noted
here because the built-in has no such cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("event_ts", T.TimestampType()),
    ]
)


def sessionized_host_activity(
    events: DataFrame,
    gap: str = "15 minutes",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Streaming events(host, url, event_ts) -> finalized per-host
    sessions (session_start, session_end, n_events, n_urls approximated
    as distinct-in-session is not available streaming — we count events
    and carry min/max url lexicographically as a cheap fingerprint)."""
    return (
        events.withWatermark("event_ts", watermark_delay)
        .groupBy(F.session_window("event_ts", gap), "host")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("url").alias("first_url"),
            F.max("url").alias("last_url"),
        )
        .select(
            "host",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "first_url",
            "last_url",
        )
    )


def stream_host_sessions(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "15 minutes",
    watermark_delay: str = "30 minutes",
):
    """File-source incarnation: parquet events in, finalized sessions
    appended to parquet out; the checkpoint carries source progress, the
    watermark, AND the open-session ranges, so a restart resumes with
    sessions still open exactly where they were."""
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(src_dir)
    sessions = sessionized_host_activity(events, gap, watermark_delay)
    return (
        sessions.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
