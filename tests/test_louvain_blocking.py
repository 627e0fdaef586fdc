"""Louvain move phase (er.louvain_move) and blocking-stage scorecard
(er.blocking_quality) tests."""

from unsupervised_ner_spark.pipeline.er import blocking_quality, louvain_move


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, "T", b, "T", 1, 1) for a, b in pairs],
        "ent_a string, type_a string, ent_b string, type_b string,"
        " n_sents long, n_docs long",
    )


def test_louvain_move_hand_checked(spark):
    # triangle {a,b,c} + pendant d on a; ONE LPA round gives
    # a -> b|T (tie a's three neighbour labels, lbl ASC) and
    # b, c, d -> a|T. m=4; deg a=3,b=2,c=2,d=1;
    # tot(a|T)=5, tot(b|T)=3.
    # a: score(a|T) = 2*4*3 - 3*5 = 9 > stay 0 -> moves, gain 9.
    # b: score(a|T own) = 8 - 2*(5-2) = 2 = score(b|T) -> tie keeps own.
    # c: symmetric to b -> stays.
    # d: score(b|T) = 8 - 1*3 = 5 > stay -4 -> moves, gain 9.
    edges = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d")])
    out = {r.ent: r for r in louvain_move(edges, iterations=1).collect()}
    assert out["a"].community == "b|T"
    assert (out["a"].moved, out["a"].gain_x2m2) == (1, 9)
    assert out["a"].proposed == "a|T"
    assert out["b"].moved == 0 and out["b"].proposed == "a|T"
    assert out["b"].gain_x2m2 == 0
    assert out["c"].moved == 0
    assert (out["d"].moved, out["d"].proposed) == (1, "b|T")
    assert out["d"].gain_x2m2 == 9


def test_louvain_merges_singleton_pairs(spark):
    # two disjoint edges; one synchronous LPA round swaps labels, so
    # every community is a singleton holding the PARTNER's label. The
    # move phase repairs that: each node joins its partner's community
    # (m=2, deg=1: score = 2*2*1 - 1*1 = 3 > stay 0).
    edges = _edges(spark, [("a", "b"), ("c", "d")])
    out = {r.ent: r for r in louvain_move(edges, iterations=1).collect()}
    partner_label = {"a": "a|T", "b": "b|T", "c": "c|T", "d": "d|T"}
    for ent, r in out.items():
        assert (r.moved, r.gain_x2m2) == (1, 3)
        assert r.proposed == partner_label[ent]


def test_blocking_quality_exact(spark):
    cand = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a long, doc_b long"
    )
    truth = spark.createDataFrame(
        [(1, 2), (3, 4)], "doc_a long, doc_b long"
    )
    row = blocking_quality(cand, truth, 5).collect()[0]
    assert (row.n_docs, row.n_cand, row.n_truth, row.n_hit) == (5, 2, 2, 1)
    assert row.pc_ppm == 500_000
    assert row.pq_ppm == 500_000
    # 1e6 - 2*1e6 // (5*4/2 = 10) = 800000
    assert row.rr_ppm == 800_000


def test_blocking_quality_empty_candidates(spark):
    cand = spark.createDataFrame([], "doc_a long, doc_b long")
    truth = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    row = blocking_quality(cand, truth, 4).collect()[0]
    assert (row.n_cand, row.n_hit, row.pc_ppm, row.pq_ppm) == (0, 0, 0, 0)
    assert row.rr_ppm == 1_000_000
