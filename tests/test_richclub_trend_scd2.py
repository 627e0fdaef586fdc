"""Rich-club coefficient (er.rich_club), exact-integer OLS trend
(asof.trend_ols), and SCD2 history build (asof.scd2_history) tests."""

import datetime

from unsupervised_ner_spark.ops.asof import scd2_history, trend_ols
from unsupervised_ner_spark.pipeline.er import rich_club


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, "T", b, "T", 1, 1) for a, b in pairs],
        "ent_a string, type_a string, ent_b string, type_b string,"
        " n_sents long, n_docs long",
    )


def test_rich_club_k4_plus_pendant(spark):
    # K4 on {a,b,c,d} plus pendant e-a. Degrees: a=4, b=c=d=3, e=1.
    # k=1: rich set {a,b,c,d} wires as a clique -> phi = 1.0 exactly.
    # k=3: rich set {a} alone -> guard row (phi 0).  k=4: empty.
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
          ("c", "d")]
    rows = {r.k: r for r in rich_club(_edges(spark, k4 + [("a", "e")])).collect()}
    assert set(rows) == {1, 3, 4}
    assert (rows[1].n_rich, rows[1].e_rich, rows[1].phi_ppm) == (4, 6, 1_000_000)
    assert (rows[3].n_rich, rows[3].e_rich, rows[3].phi_ppm) == (1, 0, 0)
    assert (rows[4].n_rich, rows[4].e_rich, rows[4].phi_ppm) == (0, 0, 0)


def test_rich_club_star_all_guarded(spark):
    # Star S4: hub degree 4, leaves degree 1 -> no threshold has a rich
    # pair, every row is the guarded zero.
    star = [("h", "l1"), ("h", "l2"), ("h", "l3"), ("h", "l4")]
    rows = rich_club(_edges(spark, star)).collect()
    assert {r.k for r in rows} == {1, 4}
    assert all(r.phi_ppm == 0 for r in rows)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def _day(d):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d)


def test_trend_exact_positive_and_negative_slope(spark):
    # up: daily counts [1,3,5] on consecutive days -> slope exactly 2.
    # down: [5,3,1] -> exactly -2 (sign-factored division).
    rows = []
    eid = 0
    for d, c in [(0, 1), (1, 3), (2, 5)]:
        for _ in range(c):
            rows.append((eid, _day(d), 1, "up")); eid += 1
    for d, c in [(0, 5), (1, 3), (2, 1)]:
        for _ in range(c):
            rows.append((eid, _day(d), 1, "down")); eid += 1
    out = {r.event_type: r for r in trend_ols(_events(spark, rows)).collect()}
    # n=3, sx=3, sy=9, sxy=13, sxx=5 -> num=12, den=6
    assert (out["up"].slope_num, out["up"].slope_den) == (12, 6)
    assert out["up"].slope_ppm == 2_000_000
    assert (out["down"].slope_num, out["down"].slope_ppm) == (-12, -2_000_000)


def test_trend_single_day_guard_and_shift_invariance(spark):
    # one day -> den 0 -> ppm 0; a large epoch offset must not change
    # the slope (min-day shift).
    rows = [(0, _day(0), 1, "one"), (1, _day(0), 1, "one")]
    rows += [(2, _day(7000), 1, "far"), (3, _day(7001), 1, "far"),
             (4, _day(7001), 1, "far")]
    out = {r.event_type: r for r in trend_ols(_events(spark, rows)).collect()}
    assert (out["one"].slope_den, out["one"].slope_ppm) == (0, 0)
    # far: days [0,1] after shift, counts [1,2] -> slope exactly 1.
    assert (out["far"].slope_num, out["far"].slope_den) == (1, 1)
    assert out["far"].slope_ppm == 1_000_000


def test_scd2_runs_compress_and_chain(spark):
    # user 1: A A B A -> three intervals; valid_to chains to the next
    # island's valid_from; only the last island is current.
    t = [_day(i) for i in range(4)]
    rows = [(0, t[0], 1, "A"), (1, t[1], 1, "A"), (2, t[2], 1, "B"),
            (3, t[3], 1, "A")]
    out = sorted(scd2_history(_events(spark, rows)).collect(),
                 key=lambda r: r.island)
    us = [int(x.timestamp() * 1_000_000) for x in t]
    assert [(r.state, r.n_events) for r in out] == [("A", 2), ("B", 1), ("A", 1)]
    assert [r.valid_from_us for r in out] == [us[0], us[2], us[3]]
    assert [r.valid_to_us for r in out] == [us[2], us[3], None]
    assert [r.is_current for r in out] == [0, 0, 1]


def test_scd2_single_run_per_user(spark):
    # two users, each a single unbroken run -> one open interval each.
    rows = [(0, _day(0), 1, "X"), (1, _day(1), 1, "X"),
            (2, _day(0), 2, "Y")]
    out = scd2_history(_events(spark, rows)).collect()
    assert len(out) == 2
    assert all(r.is_current == 1 and r.valid_to_us is None for r in out)
