"""Sparse TF-cosine pairs (textstats.cosine_pairs) and pointer-doubling
redirect resolution (webtext.redirect_chains) tests."""

import pytest

from unsupervised_ner_spark.ops.textstats import cosine_pairs
from unsupervised_ner_spark.ops.webtext import redirect_chains


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_cosine_pairs_exact_uncapped(spark):
    # d0 = "a a b", d1 = "a b c": dot = 2*1 + 1*1 = 3, norms 5 and 3,
    # cos2 = 9/15 -> 600000 ppm exactly.
    d = _docs(spark, ["a a b", "a b c", "z z"])
    rows = cosine_pairs(d, max_df=None, min_shared=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b, r.shared_terms, r.dot) == (0, 1, 2, 3)
    assert (r.norm2_a, r.norm2_b, r.cos2_ppm) == (5, 3, 600_000)


def test_cosine_pairs_df_cap_excludes_boilerplate(spark):
    # 'the' appears in all 4 docs; with max_df=3 it can neither pair nor
    # count toward norms -> only the (a b) overlap survives.
    d = _docs(spark, ["the a b", "the a b", "the x y", "the p q"])
    rows = cosine_pairs(d, max_df=3, min_shared=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b, r.dot, r.norm2_a, r.norm2_b) == (0, 1, 2, 2, 2)
    assert r.cos2_ppm == 1_000_000  # identical rare vectors


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_redirect_chain_hops_exact(spark):
    # a -> b -> c -> d: every src resolves to d with its exact distance.
    out = {
        r.url: (r.canonical_url, r.hops)
        for r in redirect_chains(
            _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
        ).collect()
    }
    assert out == {"a": ("d", 3), "b": ("d", 2), "c": ("d", 1)}


def test_redirect_seven_hop_chain_in_three_rounds(spark):
    # 7-hop chain needs ceil(log2 7) = 3 doubling rounds — max_rounds=3
    # must suffice (per-hop iteration would need 7).
    chain = [(str(i), str(i + 1)) for i in range(7)]
    out = {
        r.url: (r.canonical_url, r.hops)
        for r in redirect_chains(_edges(spark, chain), max_rounds=3).collect()
    }
    assert out["0"] == ("7", 7) and out["6"] == ("7", 1)


def test_redirect_cycle_raises(spark):
    with pytest.raises(ValueError, match="cycle"):
        redirect_chains(_edges(spark, [("x", "y"), ("y", "x")]), max_rounds=4)
