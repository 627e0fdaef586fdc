"""Canonical-group conflict audit (webtext.canonical_conflicts) and
inter-arrival cadence (asof.interarrival) tests."""

import datetime

from unsupervised_ner_spark.ops.asof import interarrival
from unsupervised_ner_spark.ops.webtext import canonical_conflicts


def test_canonical_conflicts_both_branches(spark):
    # chain a->b->c (c terminal) with two distinct fps -> conflict;
    # chain x->y (y terminal) with one shared fp -> clean; lone z clean.
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "src string, dst string"
    )
    pages = spark.createDataFrame(
        [("a", "f1"), ("b", "f1"), ("c", "f2"), ("x", "f3"), ("y", "f3"),
         ("z", "f4")],
        "url string, fp string",
    )
    out = {r.canonical_url: r for r in canonical_conflicts(edges, pages).collect()}
    assert (out["c"].n_docs, out["c"].n_fingerprints, out["c"].is_conflict) == (3, 2, 1)
    assert (out["y"].n_docs, out["y"].n_fingerprints, out["y"].is_conflict) == (2, 1, 0)
    assert (out["z"].n_docs, out["z"].is_conflict) == (1, 0)


def test_interarrival_exact_quantiles(spark):
    # one user, type A at t = 0, 1, 3, 6, 10 s -> gaps 1, 2, 3, 4 s.
    # n=4: med rank ceil(2)=2 -> 2s; p90 rank ceil(3.6)=4 -> 4s.
    base = datetime.datetime(2024, 1, 1)
    ts = [0, 1, 3, 6, 10]
    rows = [
        (i, base + datetime.timedelta(seconds=t), 1, "A")
        for i, t in enumerate(ts)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    r = interarrival(ev).collect()[0]
    assert (r.n_gaps, r.med_gap_us, r.p90_gap_us, r.max_gap_us) == (
        4, 2_000_000, 4_000_000, 4_000_000
    )


def test_interarrival_gaps_are_per_user_stream(spark):
    # two users interleaved in time: gaps never cross users.
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (0, base + datetime.timedelta(seconds=0), 1, "A"),
        (1, base + datetime.timedelta(seconds=1), 2, "A"),
        (2, base + datetime.timedelta(seconds=10), 1, "A"),
        (3, base + datetime.timedelta(seconds=12), 2, "A"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    r = interarrival(ev).collect()[0]
    # gaps: user1 10s, user2 11s -> n=2, med rank 1 -> 10s, max 11s
    assert (r.n_gaps, r.med_gap_us, r.max_gap_us) == (2, 10_000_000, 11_000_000)
