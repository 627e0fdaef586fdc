"""Benford audit (asof.benford_audit) and MMR re-ranking
(simsearch.mmr_rerank) tests."""

import datetime

from unsupervised_ner_spark.ops.asof import BENFORD_PPM, benford_audit
from unsupervised_ner_spark.ops.simsearch import mmr_rerank


def _ev(spark, values, etype="pay"):
    base = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, base + datetime.timedelta(minutes=i), 1, etype, float(v))
            for i, v in enumerate(values)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )


def test_benford_digits_and_deviation(spark):
    # cents: 123 (d=1), 19 (d=1), 2500 (d=2), 999 (d=9), 0.00 excluded
    out = {
        r.digit: r
        for r in benford_audit(_ev(spark, [1.23, 0.19, 25.0, 9.99, 0.0]))
        .collect()
    }
    assert set(out) == {1, 2, 9}
    d1 = out[1]
    assert d1.n == 2
    assert d1.obs_ppm == 2 * 1_000_000 // 4
    assert d1.benford_ppm == BENFORD_PPM[1]
    assert d1.abs_dev_ppm == abs(d1.obs_ppm - BENFORD_PPM[1])
    l1 = sum(r.abs_dev_ppm for r in out.values())
    assert all(r.l1_dev_ppm == l1 for r in out.values())


def test_benford_magnitude_ladder_boundaries(spark):
    # exact powers of ten: 10.00 -> cents 1000 -> digit 1; 0.10 -> 10 -> 1;
    # 90.00 -> 9000 -> 9
    out = {r.digit: r.n for r in
           benford_audit(_ev(spark, [10.0, 0.10, 90.0])).collect()}
    assert out == {1: 2, 9: 1}


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )


def test_mmr_diversifies_away_from_duplicates(spark):
    # query 0 = [1,0]; vec 1 and 2 are near-identical top hits; vec 3 is
    # lower-relevance but far from 1. At lambda=0.5 the near-duplicate's
    # marginal score collapses ((rel - maxsim) ~ 0 when sim ~ rel) while
    # the diverse hit keeps rel - sim = 500 - 473 > 0, so MMR's second
    # pick must skip the duplicate. (In 2-D everything near the query is
    # also near the top hit, so lambda=0.7 would still favor the dup —
    # the lambda knob IS the diversity dial this test exercises.)
    vecs = [
        [1.0, 0.0],        # 0: query
        [0.999, 0.03],     # 1: top hit
        [0.998, 0.04],     # 2: near-duplicate of 1
        [0.5, -0.866],     # 3: diverse, lower relevance
    ]
    out = {r.mmr_rank: r for r in
           mmr_rerank(_emb(spark, vecs), n_queries=1, m=3, k=3,
                      lam_tenths=5).collect()}
    assert out[1].vec_id == 1
    assert out[1].score_mil == out[1].rel_mil  # first pick: pure relevance
    assert out[2].vec_id == 3  # the near-dup 2 is crowded out
    assert out[3].vec_id == 2
    # round-2 score follows the exact integer formula (lambda 5/10)
    r2 = out[2]
    assert r2.score_mil == (
        5 * r2.rel_mil - 5 * _sim_mil(vecs[3], vecs[1])
    ) // 10


def _sim_mil(a, b):
    import math

    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return math.floor(round(dot / (na * nb), 9) * 1000)


def test_mmr_rank_count_and_determinism(spark):
    vecs = [[float(i % 4 + 1), float((i * 5) % 7)] for i in range(12)]
    out1 = sorted(
        mmr_rerank(_emb(spark, vecs), n_queries=2, m=5, k=3).collect(),
        key=lambda r: (r.query_id, r.mmr_rank),
    )
    out2 = sorted(
        mmr_rerank(_emb(spark, vecs), n_queries=2, m=5, k=3).collect(),
        key=lambda r: (r.query_id, r.mmr_rank),
    )
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]
    for qid in (0, 1):
        ranks = [r.mmr_rank for r in out1 if r.query_id == qid]
        assert ranks == [1, 2, 3]
