"""SHACL cardinality validation (er.shacl_cardinality) and time-decay
scoring (asof.decay_score) tests."""

import datetime

from unsupervised_ner_spark.ops.asof import decay_score
from unsupervised_ner_spark.pipeline.er import shacl_cardinality


def test_shacl_cardinality_verdicts(spark):
    facts = spark.createDataFrame(
        [
            # s1 owns 3 distinct objects (one re-observed -> still 3)
            ("s1", "owns", "a"), ("s1", "owns", "b"), ("s1", "owns", "c"),
            ("s1", "owns", "a"),
            ("s2", "owns", "a"),
            ("s1", "heads", "x"), ("s1", "heads", "y"),  # cap 1 -> excess 1
            ("s3", "advises", "z"),  # undeclared predicate -> dropped
        ],
        "subj string, pred string, obj string",
    )
    out = {
        (r.subj, r.pred): r
        for r in shacl_cardinality(
            facts, [("owns", 2), ("heads", 1)]
        ).collect()
    }
    assert out[("s1", "owns")].n_objs == 3
    assert out[("s1", "owns")].is_violation == 1
    assert out[("s1", "owns")].excess == 1
    assert out[("s2", "owns")].is_violation == 0
    assert out[("s2", "owns")].excess == 0
    assert out[("s1", "heads")].is_violation == 1
    assert ("s3", "advises") not in out


def _ev(spark, rows):
    base = datetime.datetime(1970, 1, 1)
    return spark.createDataFrame(
        [
            (i, base + datetime.timedelta(days=d, hours=1), u, "t", float(v))
            for i, (d, u, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
def test_decay_score_halves_per_week(spark):
    # max day = 28. user 1: 10.00 on day 28 (0 halvings), 10.00 on day
    # 21 (1 whole week -> 500), 10.00 on day 13 (15 days -> 2 halvings
    # -> 250). user 2: 8.01 on day 0 (4 halvings -> 801 div 16 = 50).
    rows = [(28, 1, 10.0), (21, 1, 10.0), (13, 1, 10.0), (0, 2, 8.01)]
    out = {r.user_id: r for r in decay_score(_ev(spark, rows)).collect()}
    u1 = out[1]
    assert u1.raw_cents == 3000
    assert u1.decayed_cents == 1000 + 500 + 250
    assert u1.n_events == 3 and u1.days_since_last == 0
    u2 = out[2]
    assert (u2.raw_cents, u2.decayed_cents) == (801, 50)
    assert u2.days_since_last == 28


def test_decay_score_halving_clamp(spark):
    # an event 700 days old would want 100 halvings; the clamp at 62
    # floors it to cents div 2^62 = 0 instead of overflowing the shift
    rows = [(700, 1, 100.0), (0, 1, 1.0)]
    out = {r.user_id: r for r in decay_score(_ev(spark, rows)).collect()}
    assert out[1].decayed_cents == 100 // (2 ** 62) + 10000
