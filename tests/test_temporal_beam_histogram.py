"""Interval conflicts (triples.interval_conflicts), graph beam search
(simsearch.graph_beam_search), and the histogram bucket-rule invariant."""

from unsupervised_ner_spark.ops.simsearch import graph_beam_search
from unsupervised_ner_spark.pipeline.triples import interval_conflicts


def _facts(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred_norm string, obj string, day long"
    )


def test_interval_conflicts_overlap_rule(spark):
    rows = [
        # 'cap' is functional: s1..s3 single-valued, s4 the violator
        ("s1", "cap", "a", 0),
        ("s2", "cap", "b", 5),
        ("s3", "cap", "c", 9),
        ("s5", "cap", "d", 3),  # 4 of 5 single-valued: 4*5 >= 5*4
        # s4: obj x valid days 0-2; obj y island 1 at day 1 (overlaps x),
        # island 2 at day 50 (overlaps nothing)
        ("s4", "cap", "x", 0), ("s4", "cap", "x", 2),
        ("s4", "cap", "y", 1), ("s4", "cap", "y", 50),
        # 'loc' is NOT functional (every subject multi-valued) -> excluded
        ("t1", "loc", "p", 0), ("t1", "loc", "q", 0),
        ("t2", "loc", "p", 3), ("t2", "loc", "q", 3),
    ]
    out = interval_conflicts(_facts(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.pred_norm, r.subj, r.obj_a, r.obj_b) == ("cap", "s4", "x", "y")
    assert (r.a_from, r.a_to) == (0, 2)
    assert (r.b_from, r.b_to) == (1, 1)
    assert r.overlap_days == 1  # [0,2] n [1,1] = day 1


def test_interval_conflicts_gap_merges_islands(spark):
    # y observed at days 0 and 6 (gap 6 <= 7): ONE island 0-6 that
    # overlaps x's 4-5 window; with gap_days=3 it would split into two
    # 1-day islands and only day-... none would overlap
    rows = [
        ("s1", "cap", "a", 0), ("s2", "cap", "b", 0), ("s3", "cap", "c", 0),
        ("s5", "cap", "d", 0),
        ("s4", "cap", "x", 4), ("s4", "cap", "x", 5),
        ("s4", "cap", "y", 0), ("s4", "cap", "y", 6),
    ]
    merged = interval_conflicts(_facts(spark, rows), gap_days=7).collect()
    assert len(merged) == 1 and merged[0].overlap_days == 2
    split = interval_conflicts(_facts(spark, rows), gap_days=3).collect()
    assert split == []


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )


def test_beam_search_zero_rounds_is_entry_only(spark):
    vecs = [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [0.5, 0.5]]
    out = graph_beam_search(
        _emb(spark, vecs), rounds=0, query_mod=2
    ).collect()
    # queries = vec_id 0 and 2; beam after 0 rounds = the single entry
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == {0, 2}
    for q, rs in by_q.items():
        assert len(rs) == 1 and rs[0].rank == 1
    # both queries share the same global entry vector
    assert len({rs[0].vec_id for rs in by_q.values()}) == 1


def test_beam_search_identical_vectors_saturate(spark):
    vecs = [[1.0, 2.0]] * 8
    out = graph_beam_search(_emb(spark, vecs), query_mod=4).collect()
    assert out, "expected beam rows"
    for r in out:
        assert r.cos_mil == 1000
    ranks = sorted(r.rank for r in out if r.q_id == 0)
    assert ranks == list(range(1, len(ranks) + 1))


def test_beam_search_ranks_monotone(spark):
    vecs = [
        [float(i % 5 + 1), float((i * 7) % 11), float((i * 3) % 13)]
        for i in range(30)
    ]
    out = graph_beam_search(_emb(spark, vecs), query_mod=10).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, {})[r.rank] = r.cos_mil
    for q, d in by_q.items():
        ranks = sorted(d)
        assert ranks == list(range(1, len(ranks) + 1))
        assert all(d[a] >= d[b] for a, b in zip(ranks, ranks[1:]))


def test_histogram_bucket_rule_partitions_range():
    # the exact-integer invariant behind rel_histogram: bucket(x) lands
    # x inside [lo(b), hi(b)], buckets tile [gmin, gmax] exactly
    nb = 20
    for gmin, gmax in [(-250, 317), (0, 0), (3, 22), (100, 32753)]:
        span = gmax - gmin + 1
        lo = lambda b: gmin + (span * b + nb - 1) // nb
        hi = lambda b: gmin + (span * (b + 1) + nb - 1) // nb - 1
        assert lo(0) == gmin and hi(nb - 1) == gmax
        for b in range(nb - 1):
            assert hi(b) + 1 == lo(b + 1)
        for x in range(gmin, gmax + 1):
            b = ((x - gmin) * nb) // span
            if b > nb - 1:
                b = nb - 1
            assert lo(b) <= x <= hi(b)
