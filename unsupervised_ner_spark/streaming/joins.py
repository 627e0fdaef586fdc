"""Watermarked stream-stream join — the third streaming-join primitive
(stateless stream-static broadcast lives in enrich.py; keyed custom state
in stateful.py). Two unbounded streams — page-fetch events and page-parse
events — join on url with an event-time range condition, so Spark can
buffer each side in the state store only as long as a match is still
possible and evict rows once the other side's watermark passes the range
bound.

Why the range condition is mandatory at scale: an unconstrained
stream-stream equi-join must retain EVERY past row of both sides forever
(any future row might match). The watermark + time bound turns state into
a sliding window of at most ``join_window`` per side — 100 TB/day ingest
holds state proportional to throughput x window, independent of history.

Semantics (inner join, append mode): a (fetch, parse) pair is emitted
exactly once when both sides have arrived and the parse timestamp lies in
[fetch_ts, fetch_ts + join_window]; a side arriving later than the
watermark allows is dropped, not matched retroactively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FETCH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("fetch_ts", T.TimestampType()),
        T.StructField("status", T.IntegerType()),
    ]
)

PARSE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("parse_ts", T.TimestampType()),
        T.StructField("n_sentences", T.IntegerType()),
    ]
)


def join_fetch_parse(
    fetches: DataFrame,
    parses: DataFrame,
    watermark_delay: str = "30 minutes",
    join_window: str = "60 minutes",
) -> DataFrame:
    """Inner stream-stream join of fetch and parse events on url, parse
    within [fetch_ts, fetch_ts + join_window]. Both sides watermarked so
    buffered state is evicted once no in-range partner can still arrive."""
    f = fetches.withWatermark("fetch_ts", watermark_delay)
    p = parses.withWatermark("parse_ts", watermark_delay)
    cond = (
        (f["url"] == p["url"])
        & (p["parse_ts"] >= f["fetch_ts"])
        & (p["parse_ts"] <= f["fetch_ts"] + F.expr(f"INTERVAL {join_window}"))
    )
    return f.join(p, cond, "inner").select(
        f["url"].alias("url"),
        "fetch_ts",
        "status",
        "parse_ts",
        "n_sentences",
    )


def stream_fetch_parse_joined(
    spark: SparkSession,
    fetch_dir: str,
    parse_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark_delay: str = "30 minutes",
    join_window: str = "60 minutes",
):
    """File-source incarnation: two parquet streams in, joined pairs
    appended to parquet out. The checkpoint carries source progress, the
    buffered join state, AND both watermarks — a restart resumes with the
    same pending-match buffers and lateness horizon."""
    fetches = spark.readStream.schema(FETCH_SCHEMA).parquet(fetch_dir)
    parses = spark.readStream.schema(PARSE_SCHEMA).parquet(parse_dir)
    joined = join_fetch_parse(fetches, parses, watermark_delay, join_window)
    return (
        joined.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
