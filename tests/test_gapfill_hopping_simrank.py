"""Calendar gap-fill (asof.calendar_gap_fill), hopping windows
(asof.hopping_window_counts), and SimRank-2 (er.simrank_two_iter) tests."""

import datetime

from unsupervised_ner_spark.ops.asof import (
    calendar_gap_fill,
    hopping_window_counts,
)
from unsupervised_ner_spark.pipeline.er import simrank_two_iter

EPOCH = datetime.datetime(1970, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, EPOCH + datetime.timedelta(days=d, hours=1), u, t)
            for i, (d, u, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_gap_fill_fills_interior_days_only(spark):
    # type A on days 10, 13 (gap 11, 12); type B on day 5 only (no fill).
    ev = _ev(spark, [(10, 1, "A"), (13, 1, "A"), (13, 2, "A"), (5, 1, "B")])
    out = {(r.event_type, r.day): r for r in calendar_gap_fill(ev).collect()}
    assert len(out) == 5  # A: 10..13, B: 5
    assert out[("A", 10)].n_events == 1 and out[("A", 10)].is_filled == 0
    assert out[("A", 11)].n_events == 0 and out[("A", 11)].is_filled == 1
    assert out[("A", 12)].n_events == 0 and out[("A", 12)].is_filled == 1
    assert out[("A", 13)].n_events == 2 and out[("A", 13)].is_filled == 0
    assert out[("B", 5)].n_events == 1 and out[("B", 5)].is_filled == 0


def test_hopping_window_covering_starts_and_distinct_users(spark):
    # one event on day 10 (user 1), two on day 12 (users 1, 2), width 3:
    # starts 8..10 cover day 10; starts 10..12 cover day 12.
    ev = _ev(spark, [(10, 1, "A"), (12, 1, "A"), (12, 2, "A")])
    out = {
        r.win_start_day: r
        for r in hopping_window_counts(ev, width_days=3).collect()
    }
    assert set(out) == {8, 9, 10, 11, 12}
    assert (out[8].n_events, out[8].n_users) == (1, 1)
    assert (out[9].n_events, out[9].n_users) == (1, 1)
    # start 10 covers days 10..12: all three events, two distinct users
    assert (out[10].n_events, out[10].n_users) == (3, 2)
    assert (out[11].n_events, out[11].n_users) == (2, 2)
    assert (out[12].n_events, out[12].n_users) == (2, 2)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_simrank_classic_bipartite_fixed_point(spark):
    # Jeh & Widom's two-parents example: 1,2 -> 3 and 1,2 -> 4.
    # s1(3,4) = 0.8 * 2/(2*2) = 0.4; s2(3,4) = 0.8 * (1+1)/(2*2) = 0.4.
    out = simrank_two_iter(
        _edges(spark, [("1", "3"), ("2", "3"), ("1", "4"), ("2", "4")])
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.node_a, r.node_b) == ("3", "4")
    assert (r.indeg_a, r.indeg_b) == (2, 2)
    assert r.s1_ppm == 400_000 and r.s2_ppm == 400_000
    assert r.t_sum == 2_000_000  # two diagonal s1(v,v) = 1e6 terms


def test_simrank_second_iteration_propagates(spark):
    # r -> y1, y2; y1 -> q1; y2 -> q2. (q1, q2) share NO in-neighbor
    # (s1 = 0) but s2 = 0.8 * s1(y1, y2) = 0.8 * 0.8 = 0.64.
    out = {
        (r.node_a, r.node_b): r
        for r in simrank_two_iter(
            _edges(
                spark,
                [("r", "y1"), ("r", "y2"), ("y1", "q1"), ("y2", "q2")],
            )
        ).collect()
    }
    assert set(out) == {("y1", "y2"), ("q1", "q2")}
    assert out[("y1", "y2")].s1_ppm == 800_000
    assert out[("y1", "y2")].s2_ppm == 800_000
    assert out[("q1", "q2")].s1_ppm == 0
    assert out[("q1", "q2")].s2_ppm == 640_000


def test_simrank_relay_cap_gates_hub(spark):
    # max_degree=1 removes the out-degree-2 hub r from every relay role:
    # no wedge survives, so no pair at all.
    out = simrank_two_iter(
        _edges(spark, [("r", "y1"), ("r", "y2")]), max_degree=1
    ).collect()
    assert out == []


def test_simrank_self_loops_and_duplicates_ignored(spark):
    out = simrank_two_iter(
        _edges(
            spark,
            [("a", "a"), ("1", "3"), ("1", "3"), ("2", "3"),
             ("1", "4"), ("2", "4")],
        )
    ).collect()
    assert len(out) == 1 and out[0].s1_ppm == 400_000
