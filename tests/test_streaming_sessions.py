"""Streaming sessionization (streaming/stateful.py sessionize_events):
event-time gap sessions closed by state TIMEOUT — the third custom
stateful operator (SURVEY §2.10), streaming twin of the batch
gaps-and-islands sessionization (rel_window_sessions)."""

from datetime import datetime


def _ts(h, m):
    return datetime(2026, 1, 1, h, m)


def _ms(h, m):
    import calendar

    return calendar.timegm(_ts(h, m).timetuple()) * 1000


_MTIME_STEP = [0]
_SEEN: dict[str, set] = {}


def _write(spark, rows, src, mode="append"):
    """Write a batch of event rows, then FORCE distinct, increasing file
    modification times: the file source orders micro-batches by mtime,
    and same-second writes can tie — which would let a horizon file
    process before the session events it is meant to close (dropping
    them as late). The bump makes write order == processing order."""
    import os
    import pathlib
    import time

    if mode == "overwrite":
        _SEEN[src] = set()
    spark.createDataFrame(rows, "user_id long, ts timestamp") \
        .coalesce(1).write.mode(mode).parquet(src)
    _MTIME_STEP[0] += 10
    stamp = time.time() + _MTIME_STEP[0]
    seen = _SEEN.setdefault(src, set())
    for p in sorted(pathlib.Path(src).glob("*.parquet")):
        if p.name not in seen:
            seen.add(p.name)
            os.utime(p, (stamp, stamp))


def test_session_closes_by_event_time_timeout_across_restart(spark, tmp_path):
    """A session emits exactly once, when the WATERMARK passes its last
    event + gap; open-session state survives a restart through the
    checkpoint (the session closes on the run AFTER the watermark
    advance, timeouts being evaluated against the prior trigger's
    watermark)."""
    from unsupervised_ner_spark.streaming.stateful import stream_sessions

    src = str(tmp_path / "events_in")
    out = str(tmp_path / "sessions_out")
    ckpt = str(tmp_path / "sess_ckpt")
    # user 1: three events inside one 30-min-gap session
    _write(spark, [(1, _ts(0, 1)), (1, _ts(0, 9)), (1, _ts(0, 20))], src,
           mode="overwrite")
    # horizon file: a far-future event advances the watermark past
    # 00:20 + 30min once processed
    _write(spark, [(99, _ts(6, 0))], src)
    q = stream_sessions(spark, src, out, ckpt)
    q.awaitTermination(120)
    got1 = spark.read.parquet(out).collect()
    # user 1's session may or may not have closed in run 1 depending on
    # trigger/file grouping; what must NOT exist is a partial session
    for r in got1:
        assert r.user_id != 99  # horizon session still open
        if r.user_id == 1:
            assert (r.session_start_ms, r.session_end_ms, r.n_events) == (
                _ms(0, 1), _ms(0, 20), 3)

    # restart: another horizon event — the restored watermark now times
    # out user 1's session (if it hadn't already closed)
    _write(spark, [(99, _ts(7, 0))], src)
    q2 = stream_sessions(spark, src, out, ckpt)
    q2.awaitTermination(120)
    rows = [r for r in spark.read.parquet(out).collect() if r.user_id == 1]
    assert len(rows) == 1  # exactly once, spanning the restart
    r = rows[0]
    assert (r.session_start_ms, r.session_end_ms, r.n_events) == (
        _ms(0, 1), _ms(0, 20), 3)


def test_two_sessions_same_user_split_by_gap(spark, tmp_path):
    """Events separated by more than the 30-min gap close as two distinct
    sessions with the correct bounds and counts."""
    from unsupervised_ner_spark.streaming.stateful import stream_sessions

    src = str(tmp_path / "events_in")
    out = str(tmp_path / "sessions_out")
    ckpt = str(tmp_path / "sess_ckpt")
    # session A: 00:01-00:05 (2 events); then a >30min gap;
    # session B: 02:00 (1 event)
    _write(spark, [(7, _ts(0, 1)), (7, _ts(0, 5))], src, mode="overwrite")
    _write(spark, [(7, _ts(2, 0))], src)      # closes A via timeout
    _write(spark, [(99, _ts(8, 0))], src)     # horizon for B
    q = stream_sessions(spark, src, out, ckpt)
    q.awaitTermination(120)
    _write(spark, [(99, _ts(9, 0))], src)     # flush trigger
    q2 = stream_sessions(spark, src, out, ckpt)
    q2.awaitTermination(120)
    rows = sorted(
        [r for r in spark.read.parquet(out).collect() if r.user_id == 7],
        key=lambda r: r.session_start_ms,
    )
    assert [(r.session_start_ms, r.session_end_ms, r.n_events)
            for r in rows] == [
        (_ms(0, 1), _ms(0, 5), 2),
        (_ms(2, 0), _ms(2, 0), 1),
    ]
