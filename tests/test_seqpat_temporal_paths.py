"""Sequential-pattern mining (asof.sequence_patterns) and time-respecting
two-hop paths (er.temporal_paths) tests."""

import datetime

from pyspark.sql import functions as F

from unsupervised_ner_spark.ops.asof import sequence_patterns
from unsupervised_ner_spark.pipeline.er import temporal_paths

EPOCH = datetime.datetime(1970, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, EPOCH + datetime.timedelta(hours=h), u, t)
            for i, (h, u, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_sequence_patterns_gap_tolerant_and_strict_order(spark):
    # user 1: A@1, X@2, B@3  -> supports (A,B) through the gap (X between)
    # user 2: B@1, A@2       -> supports (B,A) but NOT (A,B)
    # user 3: A@5, B@5       -> equal timestamps: strict < kills BOTH dirs
    ev = _ev(
        spark,
        [
            (1, 1, "A"), (2, 1, "X"), (3, 1, "B"),
            (1, 2, "B"), (2, 2, "A"),
            (5, 3, "A"), (5, 3, "B"),
        ],
    )
    out = {
        (r.antecedent, r.consequent): r
        for r in sequence_patterns(ev).collect()
    }
    ab = out[("A", "B")]
    assert ab.n_users == 1  # only user 1; user 3's tie is excluded
    assert ab.n_users_ant == 3 and ab.n_users_cons == 3
    assert ab.n_users_total == 3
    assert ab.confidence_ppm == 333333
    # lift = (333333 * 3) div 3 = 333333 (documented evaluation order)
    assert ab.lift_ppm == 333333
    ba = out[("B", "A")]
    assert ba.n_users == 1  # only user 2
    # gap-tolerance: (A, X) supported by user 1 even though X is adjacent;
    # (X, B) also; X appears for exactly one user
    assert out[("A", "X")].n_users == 1
    assert out[("X", "B")].n_users == 1
    assert ("X", "A") not in out  # X@2 after A@1 only; reverse unsupported


def test_sequence_patterns_repeat_needs_two_distinct_timestamps(spark):
    # user 1: A@1, A@2 -> (A, A) fires; user 2: single A -> no repeat
    ev = _ev(spark, [(1, 1, "A"), (2, 1, "A"), (4, 2, "A")])
    out = {
        (r.antecedent, r.consequent): r
        for r in sequence_patterns(ev).collect()
    }
    assert out[("A", "A")].n_users == 1
    assert out[("A", "A")].n_users_ant == 2


def _tfacts(spark, rows):
    # (subj, obj, first_seen) -> triples_temporal-shaped input
    return spark.createDataFrame(
        rows, "subj string, obj string, first_seen long"
    ).withColumn("pred_norm", F.lit("p"))


def test_temporal_paths_time_filter_and_earliest_arrival(spark):
    # a->b@10; b->c@20 (valid, wait 10); b->d@5 (INVALID: asserted before
    # a->b); a->e@30; e->c@30 (valid, wait 0, ties allowed: t2 >= t1)
    tf = _tfacts(
        spark,
        [
            ("a", "b", 10), ("b", "c", 20), ("b", "d", 5),
            ("a", "e", 30), ("e", "c", 30),
        ],
    )
    out = {(r.src, r.dst): r for r in temporal_paths(tf).collect()}
    assert set(out) == {("a", "c")}  # a->b->d rejected by time order
    ac = out[("a", "c")]
    assert ac.n_paths == 2 and ac.n_mids == 2
    assert ac.earliest_arrival == 20  # min t2 over the two valid paths
    assert ac.min_wait == 0  # the e-path: 30 - 30
    assert ac.is_cycle == 0


def test_temporal_paths_parallel_edges_collapse_to_earliest(spark):
    # two predicates assert a->b at 50 and 10: the edge timestamp is 10,
    # so b->c@15 composes (15 >= 10); cycle a->b->a flagged
    tf = _tfacts(
        spark,
        [("a", "b", 50), ("a", "b", 10), ("b", "c", 15), ("b", "a", 99)],
    )
    out = {(r.src, r.dst): r for r in temporal_paths(tf).collect()}
    assert out[("a", "c")].n_paths == 1
    assert out[("a", "a")].is_cycle == 1
    assert out[("a", "a")].min_wait == 89


def test_temporal_paths_mid_degree_cap_gates_hubs(spark):
    # hub h has out-degree 3 > cap 2 -> no path may bridge through h;
    # m (deg 1/1) still bridges
    rows = [("a", "h", 1)] + [("h", f"x{i}", 2) for i in range(3)]
    rows += [("a", "m", 1), ("m", "z", 2)]
    out = temporal_paths(_tfacts(spark, rows), max_mid_degree=2).collect()
    assert {(r.src, r.dst) for r in out} == {("a", "z")}
