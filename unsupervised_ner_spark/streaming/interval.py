"""Streaming point-in-interval containment — the STREAM-STATIC variant of
``ops/asof.interval_join``.

Spark Structured Streaming has no range-join operator, and a raw theta
condition against a static table plans as a per-batch nested loop. The
batch operator's BUCKET BINNING fixes that here too, and better: because
the static interval side is pre-exploded to its covered time cells, the
stream side needs only a stateless projection (point -> its one cell) and
the join becomes a plain stream-static EQUI-join — no state store, no
watermark bookkeeping, each micro-batch hash-joins against the (cached)
cell-keyed interval table and emits its containments exactly once.

At 100 TB/day this is the shape you want for "which crawl window / rate
limit / maintenance freeze does this event fall into": state is ZERO
(the static side is a broadcast- or shuffle-side table, not stream
state), throughput is the narrow-map cost of the cell projection plus one
hash join per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

POINT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def stream_points_in_intervals(
    spark: SparkSession,
    points_dir: str,
    intervals: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    bucket_us: int,
    start_ts: str = "start_ts",
    end_ts: str = "end_ts",
    interval_id: str = "iv_id",
):
    """File-source point stream joined to the static interval table via
    the binned cell key; append-mode parquet sink, exactly-once through
    the checkpoint + sink manifest."""

    def _us(c):
        return F.unix_micros(F.col(c).cast("timestamp"))

    ivs = intervals.select(
        F.col(interval_id).alias("iv_id"),
        _us(start_ts).alias("_s_us"),
        _us(end_ts).alias("_e_us"),
        F.explode(
            F.sequence(
                F.floor(_us(start_ts) / bucket_us).cast("long"),
                F.floor(_us(end_ts) / bucket_us).cast("long"),
            )
        ).alias("_cell"),
    )
    pts = (
        spark.readStream.schema(POINT_SCHEMA)
        .parquet(points_dir)
        .select(
            "event_id",
            _us("ts").alias("_p_us"),
            F.floor(_us("ts") / bucket_us).cast("long").alias("_cell"),
        )
    )
    joined = (
        pts.join(ivs, "_cell")
        .filter(
            (F.col("_s_us") <= F.col("_p_us")) & (F.col("_p_us") < F.col("_e_us"))
        )
        .select(
            "event_id", "iv_id",
            (F.col("_p_us") - F.col("_s_us")).cast("long")
            .alias("us_into_interval"),
        )
    )
    return (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
