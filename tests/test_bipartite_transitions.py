"""Bipartiteness / odd-cycle accounting (er.bipartite_parity) and
clickstream transition matrix (asof.event_transitions) branch tests."""

from datetime import datetime

from unsupervised_ner_spark.ops.asof import event_transitions
from unsupervised_ner_spark.pipeline.er import bipartite_parity


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, "T", b, "T") for a, b in pairs],
        "ent_a string, type_a string, ent_b string, type_b string",
    )


def test_even_cycle_vs_odd_cycle(spark):
    c6 = [("a0", "a1"), ("a1", "a2"), ("a2", "a3"), ("a3", "a4"),
          ("a4", "a5"), ("a0", "a5")]
    c5 = [("b0", "b1"), ("b1", "b2"), ("b2", "b3"), ("b3", "b4"),
          ("b0", "b4")]
    got = {r.component: r
           for r in bipartite_parity(_edges(spark, c6 + c5),
                                     rounds=4).collect()}
    even, odd = got["a0|T"], got["b0|T"]
    assert (even.comp_size, even.n_open, even.n_odd_edges,
            even.bipartite) == (6, 0, 0, 1)
    # C5 from root b0: dists 0,1,1,2,2 -> exactly the far edge (2,2)
    # has equal parity
    assert (odd.comp_size, odd.n_open, odd.n_odd_edges,
            odd.bipartite) == (5, 0, 1, 0)


def test_horizon_opens_and_full_reach(spark):
    # path n0..n6: root = min key n0 (an endpoint), eccentricity 6
    path = [(f"n{i}", f"n{i + 1}") for i in range(6)]
    short = {r.component: r
             for r in bipartite_parity(_edges(spark, path),
                                       rounds=2).collect()}["n0|T"]
    # dist > 2 unreached: n3..n6 open; flag conservatively 0
    assert (short.comp_size, short.n_reached, short.n_open,
            short.bipartite) == (7, 3, 4, 0)
    full = {r.component: r
            for r in bipartite_parity(_edges(spark, path),
                                      rounds=6).collect()}["n0|T"]
    assert (full.n_open, full.n_odd_edges, full.bipartite) == (0, 0, 1)


def _events(spark, rows):
    # rows: (event_id, second, user_id, event_type)
    return spark.createDataFrame(
        [(eid, datetime(2024, 1, 1, 0, 0, s), uid, et)
         for eid, s, uid, et in rows],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_transitions_sentinels_and_ppm(spark):
    ev = _events(spark, [
        (1, 0, 1, "view"), (2, 5, 1, "click"), (3, 9, 1, "purchase"),
        (4, 0, 2, "view"), (5, 7, 2, "purchase"),
    ])
    got = {(r.from_type, r.to_type): (r.n_trans, r.n_from, r.trans_ppm)
           for r in event_transitions(ev).collect()}
    assert got == {
        ("_start", "view"): (2, 2, 1_000_000),
        ("view", "click"): (1, 2, 500_000),
        ("view", "purchase"): (1, 2, 500_000),
        ("click", "purchase"): (1, 1, 1_000_000),
        ("purchase", "_end"): (2, 2, 1_000_000),
    }


def test_transitions_equal_ts_tiebreak(spark):
    # same timestamp: event_id orders deterministically (2 before 3)
    ev = _events(spark, [
        (1, 0, 9, "view"), (2, 5, 9, "click"), (3, 5, 9, "error"),
    ])
    got = {(r.from_type, r.to_type) for r in event_transitions(ev).collect()}
    assert ("view", "click") in got and ("click", "error") in got
    assert ("error", "_end") in got and ("view", "error") not in got
