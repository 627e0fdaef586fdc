"""Watermarked stream-stream join (streaming/joins.py): pairs emit when
both sides arrive within the time window, unmatched/out-of-window rows
don't, and the buffered join state survives a restart through the
checkpoint."""

from datetime import datetime

from unsupervised_ner_spark.streaming.joins import (
    FETCH_SCHEMA,
    PARSE_SCHEMA,
    stream_fetch_parse_joined,
)


def _ts(h, m):
    return datetime(2026, 1, 1, h, m)


def test_stream_stream_join_matches_and_restart_state(spark, tmp_path):
    fdir = str(tmp_path / "fetch_in")
    pdir = str(tmp_path / "parse_in")
    out = str(tmp_path / "joined_out")
    ckpt = str(tmp_path / "join_ckpt")

    fetches1 = [("u1", _ts(10, 0), 200), ("u2", _ts(10, 0), 200)]
    parses1 = [("u1", _ts(10, 5), 12)]
    spark.createDataFrame(fetches1, FETCH_SCHEMA).write.parquet(fdir)
    spark.createDataFrame(parses1, PARSE_SCHEMA).write.parquet(pdir)
    q = stream_fetch_parse_joined(spark, fdir, pdir, out, ckpt)
    q.awaitTermination(120)
    rows1 = spark.read.parquet(out).collect()
    assert [(r.url, r.n_sentences) for r in rows1] == [("u1", 12)]

    # restart: u2's parse arrives late but in-window — it must match the
    # fetch BUFFERED IN THE CHECKPOINT STATE from run 1; an out-of-window
    # parse (13:00, > fetch_ts + 60 min) and an orphan url must not match
    parses2 = [("u2", _ts(10, 30), 7), ("u2", _ts(13, 0), 9), ("u9", _ts(10, 10), 3)]
    spark.createDataFrame(parses2, PARSE_SCHEMA).write.mode("append").parquet(pdir)
    q2 = stream_fetch_parse_joined(spark, fdir, pdir, out, ckpt)
    q2.awaitTermination(120)
    rows2 = {(r.url, r.n_sentences) for r in spark.read.parquet(out).collect()}
    assert rows2 == {("u1", 12), ("u2", 7)}
    assert len(spark.read.parquet(out).collect()) == 2  # no duplicate emission
