"""Unit tests for local bridges (pipeline/er.py local_bridges) and
token-budget selection (ops/textstats.py budget_select); the corpus-scale
parity gates are kg_local_bridges / txt_budget_select."""

from __future__ import annotations

from unsupervised_ner_spark.ops import textstats
from unsupervised_ner_spark.pipeline import er


def _edges(spark, pairs):
    rows = [(a, "T", b, "T", 1, 1) for a, b in pairs]
    return spark.createDataFrame(
        rows,
        "ent_a string, type_a string, ent_b string, type_b string, "
        "n_sents long, n_docs long",
    )


def test_local_bridges_triangle_plus_bridge(spark):
    # triangle a-b-c plus a pendant bridge c-d: the three triangle edges
    # have support 1, c-d is the local bridge
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    out = {
        (r.ent_a, r.ent_b): (r.n_common, r.is_bridge)
        for r in er.local_bridges(_edges(spark, pairs)).collect()
    }
    assert out[("a", "b")] == (1, 0)
    assert out[("b", "c")] == (1, 0)
    assert out[("a", "c")] == (1, 0)
    assert out[("c", "d")] == (0, 1)
    assert len(out) == 4


def test_local_bridges_double_support(spark):
    # edge x-y inside TWO triangles (witnesses u and v) -> n_common = 2
    pairs = [("x", "y"), ("u", "x"), ("u", "y"), ("v", "x"), ("v", "y")]
    out = {
        (r.ent_a, r.ent_b): r.n_common
        for r in er.local_bridges(_edges(spark, pairs)).collect()
    }
    assert out[("x", "y")] == 2


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_budget_select_order_and_cut(spark):
    # three docs; doc 1 and 2 share the repeated bigram pattern so they
    # out-score doc 3 (unique bigrams). budget = total_tokens // 2.
    docs = _docs(spark, [
        (1, "a b a b"),          # 4 tokens, repeated bigrams
        (2, "a b a b a b"),      # 6 tokens, same distribution
        (3, "q w e r t"),        # 5 tokens, all-hapax bigrams
    ])
    rows = {r.doc_id: r for r in textstats.budget_select(docs).collect()}
    assert len(rows) == 3
    total = sum(r.n_tokens for r in rows.values())
    assert all(r.budget == total // 2 for r in rows.values())
    # selection respects the (score desc, doc_id) prefix order exactly
    ordered = sorted(rows.values(), key=lambda r: (-r.score, r.doc_id))
    cum = 0
    for r in ordered:
        cum += r.n_tokens
        assert r.cum_tokens == cum
        assert r.selected == (1 if cum <= total // 2 else 0)
    # the high-quality docs outrank the hapax doc
    assert rows[3].score <= min(rows[1].score, rows[2].score)
    # both selected and rejected docs occur
    vals = {r.selected for r in rows.values()}
    assert vals == {0, 1}


def test_budget_select_band_decomposition_matches_global(spark):
    # many docs with scores spanning bands: the banded prefix sum must
    # equal a straight Python cumsum over the same total order
    docs = _docs(spark, [
        (i, " ".join(["w%d" % (i % 4)] * (2 + i % 5)) + " tail%d" % i)
        for i in range(20)
    ])
    rows = sorted(
        textstats.budget_select(docs).collect(),
        key=lambda r: (-r.score, r.doc_id),
    )
    cum = 0
    for r in rows:
        cum += r.n_tokens
        assert r.cum_tokens == cum
