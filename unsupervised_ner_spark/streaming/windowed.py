"""Event-time windowed aggregation with a watermark — the late-data
primitive of the streaming surface (Structured Streaming built-ins; no
custom state needed, unlike stateful.py's operators).

``windowed_doc_counts`` counts documents per (event-time window, lang)
with a watermark bounding both state and lateness: a window's aggregate
state is evicted once the watermark (max observed event time minus the
delay) passes the window end, at which point the finalized row is emitted
exactly once in append mode — so the parquet sink only ever holds CLOSED
windows, and a row arriving later than the watermark for an already-closed
window is dropped instead of corrupting an emitted result.

Scale posture: the aggregation state is bounded by (#open windows ×
#langs), independent of corpus size; the shuffle key is (window, lang) so
a hot language is one reducer key per window — standard agg skew. The
watermark is what makes 100 TB/day ingest viable: without it every window
ever seen stays in the state store forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("event_ts", T.TimestampType()),
    ]
)


def windowed_doc_counts(
    docs: DataFrame,
    window_duration: str = "10 minutes",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Streaming docs(doc_id, lang, event_ts) -> per-window per-lang doc
    counts, watermarked so state stays bounded and append mode emits each
    finalized window exactly once."""
    return (
        docs.withWatermark("event_ts", watermark_delay)
        .groupBy(F.window("event_ts", window_duration), "lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "lang",
            "n_docs",
        )
    )


def stream_windowed_counts(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window_duration: str = "10 minutes",
    watermark_delay: str = "30 minutes",
):
    """File-source incarnation: parquet in, finalized windows appended to
    parquet out; the checkpoint carries both source progress AND the
    watermark, so a restarted stream keeps its lateness horizon."""
    docs = spark.readStream.schema(DOCS_SCHEMA).parquet(src_dir)
    counts = windowed_doc_counts(docs, window_duration, watermark_delay)
    return (
        counts.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
