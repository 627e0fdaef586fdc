"""Watermark-lateness histogram (asof.late_events) and daily-count
correlation (asof.corr_pairs) tests."""

import datetime

from unsupervised_ner_spark.ops.asof import corr_pairs, late_events


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def _day(d):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d)


def test_late_events_buckets_and_share(spark):
    # delay_mod=4: delays cycle 0,1,4,9 -> buckets 0,1,1,1.
    rows = [(i, _day(0), 1, "A") for i in range(8)]
    out = {r.bucket: r for r in late_events(_events(spark, rows), delay_mod=4).collect()}
    assert set(out) == {0, 1}
    assert (out[0].n_events, out[0].max_delay_s) == (2, 0)
    assert (out[1].n_events, out[1].max_delay_s) == (6, 9)
    assert out[0].share_ppm == 2 * 1_000_000 // 8
    assert out[1].share_ppm == 6 * 1_000_000 // 8


def test_late_events_tail_bucket(spark):
    # event_id 50 under mod 97 -> delay 2500 s -> bucket 4.
    out = late_events(_events(spark, [(50, _day(0), 1, "B")])).collect()[0]
    assert (out.bucket, out.max_delay_s, out.share_ppm) == (4, 2500, 1_000_000)


def _mk(spark, series):
    rows, eid = [], 0
    for t, counts in series.items():
        for d, c in enumerate(counts):
            for _ in range(c):
                rows.append((eid, _day(d), 1, t)); eid += 1
    return _events(spark, rows)


def test_corr_perfectly_correlated_and_anti(spark):
    ev = _mk(spark, {"a": [1, 2, 3], "b": [2, 4, 6], "c": [3, 2, 1]})
    out = {(r.type_a, r.type_b): r for r in corr_pairs(ev).collect()}
    ab = out[("a", "b")]
    # y = 2x: r = 1 exactly -> two-step ppm = (num*1e6//vx)*num//vy
    assert ab.corr_sign == 1
    num, vx, vy = ab.corr_num, ab.var_x, ab.var_y
    assert ab.corr2_ppm == (abs(num) * 1_000_000 // vx) * abs(num) // vy
    assert ab.corr2_ppm == 1_000_000  # exact here: num^2 == vx*vy
    ac = out[("a", "c")]
    assert ac.corr_sign == -1 and ac.corr2_ppm == 1_000_000


def test_corr_constant_series_guarded(spark):
    # 'flat' has zero variance -> corr undefined -> guarded 0.
    ev = _mk(spark, {"a": [1, 2, 3], "flat": [5, 5, 5]})
    r = corr_pairs(ev).collect()[0]
    assert (r.var_y, r.corr2_ppm, r.corr_sign) == (0, 0, 0)
