"""Hand-computed gates for Dunning G2 collocations, Zipf OLS sufficient
statistics, and term burstiness."""

from __future__ import annotations

import math

from unsupervised_ner_spark.ops.textstats import (
    collocation_llr,
    term_burstiness,
    zipf_slope,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_collocation_llr_hand(spark):
    # "a b a b": bigrams (a,b)x2, (b,a)x1 -> only (a,b) survives
    # min_pair=2. Contingency: k11=2, n1x=2, nx2=2, N=3 ->
    # k12=k21=0, k22=1.
    rows = collocation_llr(_docs(spark, ["a b a b"]), min_pair=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["w1"], r["w2"], r["k11"], r["n1x"], r["nx2"], r["n_total"]) == (
        "a", "b", 2, 2, 2, 3
    )
    c11 = round(2 * (math.log(2 * 3) - math.log(2 * 2)) * 1e6)
    c22 = round(1 * (math.log(1 * 3) - math.log(1 * 1)) * 1e6)
    assert r["llr_i6"] == 2 * (c11 + c22)


def test_collocation_llr_empty_cells_zero(spark):
    # Perfectly independent-ish corpus where a bigram fills its whole
    # row and column: all other cells 0 -> they contribute exactly 0.
    rows = {
        (r["w1"], r["w2"]): r
        for r in collocation_llr(
            _docs(spark, ["p q", "p q"]), min_pair=2
        ).collect()
    }
    r = rows[("p", "q")]
    # k11 = 2 = n1x = nx2 = N: k12=k21=k22=0; llr = 2*round(2*ln(2*2/4)*1e6)=0
    assert (r["k11"], r["n1x"], r["nx2"], r["n_total"]) == (2, 2, 2, 2)
    assert r["llr_i6"] == 0


def test_zipf_slope_hand(spark):
    # tf: a=3, b=2, c=1 -> ranks a:1 b:2 c:3 (tf DESC, term ASC)
    r = zipf_slope(_docs(spark, ["a a a b b c"])).collect()[0]
    pairs = [(1, 3), (2, 2), (3, 1)]
    i9 = lambda v: round(v * 1e9)  # noqa: E731
    assert r["n_terms"] == 3
    assert r["sx_i9"] == sum(i9(math.log(rk)) for rk, _ in pairs)
    assert r["sy_i9"] == sum(i9(math.log(tf)) for _, tf in pairs)
    assert r["sxy_i9"] == sum(
        i9(math.log(rk) * math.log(tf)) for rk, tf in pairs
    )
    assert r["sxx_i9"] == sum(i9(math.log(rk) ** 2) for rk, _ in pairs)


def test_zipf_rank_tiebreak(spark):
    # Equal tf -> rank by term ASC: "aa" before "bb"; ln-ranks differ.
    r = zipf_slope(_docs(spark, ["aa bb"])).collect()[0]
    assert r["n_terms"] == 2
    # ranks 1, 2 regardless of tie: sx = round(ln2 * 1e9)
    assert r["sx_i9"] == round(math.log(2) * 1e9)
    assert r["sy_i9"] == 0  # both tf=1


def test_burstiness_hand(spark):
    got = {
        r["term"]: (r["cf"], r["df"], r["max_tf"], r["sum_tf2"])
        for r in term_burstiness(
            _docs(spark, ["x x y", "x z"]), min_cf=2
        ).collect()
    }
    # y, z have cf=1 -> cut; x: cf=3 over docs (2,1), sum_tf2 = 4+1
    assert got == {"x": (3, 2, 2, 5)}
