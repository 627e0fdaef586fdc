"""Gap-based session windows (streaming/sessions.py): events within the
gap fuse into one session, a quiet period closes it, the watermark
finalizes closed sessions exactly once in append mode, an OPEN session
survives a restart through the checkpoint (a post-restart event extends
it), and a row behind the watermark cannot reopen an emitted session."""

from datetime import datetime

from unsupervised_ner_spark.streaming.sessions import (
    EVENTS_SCHEMA,
    stream_host_sessions,
)


def _ts(h, m):
    return datetime(2026, 1, 1, h, m)


def test_session_windows_merge_finalize_and_restart(spark, tmp_path):
    src = str(tmp_path / "events_in")
    out = str(tmp_path / "sessions_out")
    ckpt = str(tmp_path / "sess_ckpt")

    # host A: 01:00 and 01:10 are within the 15-min gap -> ONE session
    # [01:00, 01:25); the 03:00 event is past the gap -> a second session
    # that also serves as the watermark horizon: end of run 1 the
    # watermark is 03:00 - 30min = 02:30 > 01:25, so session 1 is
    # finalized and emitted; session 2 (ends 03:15) stays OPEN in state.
    batch1 = [
        ("a.example", "u1", _ts(1, 0)),
        ("a.example", "u2", _ts(1, 10)),
        ("a.example", "u3", _ts(3, 0)),
    ]
    spark.createDataFrame(batch1, EVENTS_SCHEMA).write.parquet(src)
    q = stream_host_sessions(spark, src, out, ckpt)
    q.awaitTermination(120)
    rows1 = spark.read.parquet(out).collect()
    assert [
        (r.host, r.session_start, r.session_end, r.n_events, r.first_url, r.last_url)
        for r in rows1
    ] == [("a.example", _ts(1, 0), _ts(1, 25), 2, "u1", "u2")]

    # restart: 03:10 lands within the gap of the OPEN session buffered in
    # the checkpoint -> extends it to [03:00, 03:25); a late 01:05 event
    # (behind the persisted 02:30 watermark) must NOT reopen the emitted
    # session; the 05:00 horizon event pushes the watermark to 04:30,
    # finalizing the extended session with BOTH its events.
    batch2 = [
        ("a.example", "u4", _ts(3, 10)),
        ("a.example", "late", _ts(1, 5)),
        ("a.example", "u9", _ts(5, 0)),
    ]
    spark.createDataFrame(batch2, EVENTS_SCHEMA).write.mode("append").parquet(src)
    q2 = stream_host_sessions(spark, src, out, ckpt)
    q2.awaitTermination(120)
    got2 = {
        (r.host, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out).collect()
    }
    assert got2 == {
        ("a.example", _ts(1, 0), _ts(1, 25), 2),   # not re-emitted / not grown
        ("a.example", _ts(3, 0), _ts(3, 25), 2),   # open session extended across restart
    }, got2
    assert len(spark.read.parquet(out).collect()) == 2  # exactly-once emission


def test_session_windows_distinct_hosts_do_not_merge(spark, tmp_path):
    """Two hosts interleaved in time keep separate sessions (the grouping
    key partitions the session ranges)."""
    src = str(tmp_path / "events_in")
    out = str(tmp_path / "sessions_out")
    ckpt = str(tmp_path / "sess_ckpt")
    batch = [
        ("a.example", "u1", _ts(1, 0)),
        ("b.example", "v1", _ts(1, 5)),
        ("a.example", "u2", _ts(1, 10)),
        ("b.example", "v2", _ts(1, 12)),
        ("z.example", "w1", _ts(9, 0)),  # horizon: watermark 08:30
    ]
    spark.createDataFrame(batch, EVENTS_SCHEMA).write.parquet(src)
    q = stream_host_sessions(spark, src, out, ckpt)
    q.awaitTermination(120)
    got = {
        (r.host, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        ("a.example", _ts(1, 0), _ts(1, 25), 2),
        ("b.example", _ts(1, 5), _ts(1, 27), 2),
    }, got
