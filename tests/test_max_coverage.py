"""Greedy max-coverage selection (ops/curation.py max_coverage_select)
vs an exact Python greedy replication."""

from unsupervised_ner_spark.ops import curation


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "url string, ent string")


def _greedy_py(rows, k):
    from collections import defaultdict

    sets = defaultdict(set)
    for u, e in rows:
        sets[u].add(e)
    covered: set = set()
    out = []
    for r in range(1, k + 1):
        # the engine's remaining table drops fully-covered pairs, so a
        # doc with zero marginal gain has NO row: selection stops
        gains = {u: len(es - covered) for u, es in sets.items()
                 if es - covered}
        if not gains:
            break
        best = min(gains, key=lambda u: (-gains[u], u))
        out.append((r, best, gains[best]))
        covered |= sets[best]
    return out


def test_max_coverage_matches_python_greedy(spark):
    # d1 covers 4; d2 overlaps d1 heavily (greedy must NOT pick it
    # second); d3 adds 2 fresh — classic greedy-vs-naive ordering
    rows = [
        ("d1", "a"), ("d1", "b"), ("d1", "c"), ("d1", "d"),
        ("d2", "a"), ("d2", "b"), ("d2", "c"),
        ("d3", "x"), ("d3", "y"),
        ("d4", "d"), ("d4", "x"),
    ]
    got = [
        (r.round, r.url, r.gain)
        for r in curation.max_coverage_select(_pairs(spark, rows), k=3)
            .orderBy("round").collect()
    ]
    assert got == _greedy_py(rows, 3)
    assert got[0] == (1, "d1", 4)
    assert got[1][1] == "d3"  # not the redundant d2


def test_max_coverage_tiebreak_and_duplicates(spark):
    # equal gains tie-break on url ASC; duplicate (url, ent) rows must
    # not inflate gains
    rows = [("b", "e1"), ("b", "e1"), ("b", "e2"),
            ("a", "e3"), ("a", "e4"), ("a", "e4")]
    got = [
        (r.round, r.url, r.gain)
        for r in curation.max_coverage_select(_pairs(spark, rows), k=2)
            .orderBy("round").collect()
    ]
    assert got == [(1, "a", 2), (2, "b", 2)]


def test_max_coverage_stops_when_exhausted(spark):
    # after both docs are picked nothing remains: round 3 must not emit
    rows = [("a", "e1"), ("b", "e2")]
    got = curation.max_coverage_select(_pairs(spark, rows), k=5).collect()
    assert len(got) == 2
