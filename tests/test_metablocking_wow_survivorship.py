"""Meta-blocking (dedup.meta_blocking_pairs), week-over-week change
(asof.wow_change), and dedup survivorship (curation.dedup_survivorship)
tests."""

import datetime

from unsupervised_ner_spark.ops.asof import wow_change
from unsupervised_ner_spark.ops.curation import dedup_survivorship
from unsupervised_ner_spark.ops.dedup import meta_blocking_pairs


def test_meta_blocking_prunes_weak_pairs(spark):
    # WNP prunes a pair only when its weight is below BOTH endpoints'
    # means (each node keeps its own best pairs): docs 1=2 and 3=4 are
    # identical pairs (full 4-band weight), doc 3/4 partially overlap
    # doc 1/2 — any cross pair that band-collides has weight < 4 while
    # both its endpoints average above it, so it must be pruned
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    cross = " ".join(base.split()[:7]) + " lambda mu nu"
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, cross), (4, cross)],
        "doc_id long, text string",
    )
    out = {(r.doc_a, r.doc_b): r for r in
           meta_blocking_pairs(docs, max_bucket=100).collect()}
    assert out[(1, 2)].kept == 1 and out[(3, 4)].kept == 1
    full_w = out[(1, 2)].weight
    assert out[(3, 4)].weight == full_w
    cross_pairs = [k for k in out if k not in {(1, 2), (3, 4)}]
    assert cross_pairs, "expected at least one cross band collision"
    for k in cross_pairs:
        assert out[k].weight < full_w
        assert out[k].kept == 0


def test_meta_blocking_uniform_weights_keep_all(spark):
    # two disjoint identical pairs: every pair has the same weight as
    # its endpoints' mean -> all kept (the >= rule)
    docs = spark.createDataFrame(
        [(1, "aa bb cc dd ee"), (2, "aa bb cc dd ee"),
         (3, "ff gg hh ii jj"), (4, "ff gg hh ii jj")],
        "doc_id long, text string",
    )
    out = meta_blocking_pairs(docs, max_bucket=100).collect()
    assert out and all(r.kept == 1 for r in out)


def _ev(spark, rows):
    base = datetime.datetime(1970, 1, 1, 12)
    return spark.createDataFrame(
        [
            (i, base + datetime.timedelta(days=d), 1, t, 1.0)
            for i, (d, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )


def test_wow_change_exact(spark):
    rows = [(0, "click")] * 4 + [(7, "click")] * 6 + [(14, "click")] * 3
    out = {r.week: r for r in wow_change(_ev(spark, rows)).collect()}
    assert (out[0].n, out[0].is_first, out[0].change_ppm) == (4, 1, 0)
    w1 = out[1]
    assert (w1.n, w1.prev_n, w1.delta) == (6, 4, 2)
    assert w1.change_ppm == 2 * 1_000_000 // 4
    w2 = out[2]
    assert (w2.delta, w2.is_first) == (-3, 0)
    assert w2.change_ppm == (-3) * 1_000_000 // 6  # floor div: -500000
    assert w2.change_ppm == -500_000


def test_survivorship_prefers_quality_then_length(spark):
    # cluster of near-dups: doc 10 is the full good copy, doc 11 a
    # truncated prefix (still good, shorter), doc 12 a stopword-free
    # (boilerplate-class) variant. The representative must be 10.
    full = ("the quick brown fox jumps over the lazy dog and then the "
            "dog chases the fox around the big green field all day")
    prefix = " ".join(full.split()[:18])
    boiler = " ".join(w for w in full.split() if w != "the")
    docs = spark.createDataFrame(
        [(10, full), (11, prefix), (12, boiler),
         (50, "totally unrelated words appear here nine times over")],
        "doc_id long, text string",
    )
    rows = dedup_survivorship(docs).collect()
    assert len(rows) == 1  # doc 50 never clusters
    r = rows[0]
    assert r.n_docs >= 2 and r.rep_doc == 10
    assert r.rep_quality == "good"
    assert r.n_dropped == r.n_docs - 1
