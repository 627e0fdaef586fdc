"""Stream-static binned interval join (streaming/interval.py): stateless
containment against a static interval table, exactly-once across restart,
and agreement with the batch operator on the same data."""

from __future__ import annotations

import datetime as dt

from unsupervised_ner_spark.streaming.interval import (
    POINT_SCHEMA,
    stream_points_in_intervals,
)


def _ts(sec):
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=sec)


def test_stream_interval_join_and_restart(spark, tmp_path):
    pdir = str(tmp_path / "points_in")
    out = str(tmp_path / "contained_out")
    ckpt = str(tmp_path / "iv_ckpt")
    ivs = spark.createDataFrame(
        [("A", _ts(100), _ts(300)), ("B", _ts(250), _ts(350))],
        "iv_id string, start_ts timestamp, end_ts timestamp",
    )

    spark.createDataFrame(
        [(1, _ts(100)), (2, _ts(299)), (9, _ts(50))], POINT_SCHEMA
    ).write.parquet(pdir)
    q = stream_points_in_intervals(
        spark, pdir, ivs, out, ckpt, bucket_us=100_000_000
    )
    q.awaitTermination(120)
    got1 = {(r.event_id, r.iv_id, r.us_into_interval)
            for r in spark.read.parquet(out).collect()}
    assert got1 == {
        (1, "A", 0),
        (2, "A", 199_000_000),
        (2, "B", 49_000_000),
    }

    # restart on the same checkpoint: only NEW files are processed, prior
    # containments are not re-emitted (exactly-once through the manifest)
    spark.createDataFrame(
        [(3, _ts(300)), (4, _ts(350))], POINT_SCHEMA
    ).write.mode("append").parquet(pdir)
    q2 = stream_points_in_intervals(
        spark, pdir, ivs, out, ckpt, bucket_us=100_000_000
    )
    q2.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    got2 = {(r.event_id, r.iv_id, r.us_into_interval) for r in rows}
    assert got2 == got1 | {(3, "B", 50_000_000)}  # ==end excluded for 4
    assert len(rows) == len(got2)  # no duplicate emission

    # agreement with the batch operator on the full point set
    from unsupervised_ner_spark.ops.asof import interval_join

    pts = spark.read.schema(POINT_SCHEMA).parquet(pdir)
    batch = {
        (r.event_id, r.iv_iv_id, r.us_into_interval)
        for r in interval_join(
            pts, ivs, point_ts="ts", start_ts="start_ts", end_ts="end_ts",
            bucket_us=100_000_000,
            point_cols=["event_id"], interval_cols=["iv_id"],
        ).collect()
    }
    assert batch == got2
