"""Taxonomy LCA (taxonomy.taxonomy_lca) order/tie/cap branch tests."""

from unsupervised_ner_spark.pipeline.taxonomy import (
    taxonomy_closure,
    taxonomy_lca,
)


def _closure(spark, edges):
    df = spark.createDataFrame(edges, "hypo string, hyper string")
    return taxonomy_closure(df, max_hops=8)


def test_lca_prefers_lower_ancestor(spark):
    # diamond: a,b -> p -> r; lca(a,b) = p (max 1,1 beats r's 2,2)
    cl = _closure(spark, [("a", "p"), ("b", "p"), ("p", "r")])
    got = {(r.node_a, r.node_b): (r.lca, r.hops_a, r.hops_b)
           for r in taxonomy_lca(cl).collect()}
    assert got[("a", "b")] == ("p", 1, 1)
    # pairs THROUGH r also resolve: lca(a, p) = r (their only strict
    # common ancestor)
    assert got[("a", "p")] == ("r", 2, 1)


def test_lca_max_then_sum_order(spark):
    # m: x at 1, y at 3; g: x at 1, y at 2 -> g wins on max (2 < 3)
    cl = _closure(spark, [
        ("y", "u"), ("u", "v"), ("v", "m"), ("x", "m"),
        ("u", "g"), ("x", "g"),
    ])
    got = {(r.node_a, r.node_b): r.lca for r in taxonomy_lca(cl).collect()}
    assert got[("x", "y")] == "g"


def test_lca_equal_score_lexicographic_tiebreak(spark):
    # a,b share p1 AND p2, both at (1,1): min key wins
    cl = _closure(spark, [("a", "p2"), ("b", "p2"), ("a", "p1"),
                          ("b", "p1")])
    got = {(r.node_a, r.node_b): r.lca for r in taxonomy_lca(cl).collect()}
    assert got[("a", "b")] == "p1"


def test_lca_descendant_cap_branch(spark):
    # cap = 1 excludes every ancestor with 2+ descendants: the diamond
    # pair loses its only common ancestor and drops from the output
    cl = _closure(spark, [("a", "p"), ("b", "p")])
    assert taxonomy_lca(cl, max_desc=1).count() == 0
    assert taxonomy_lca(cl, max_desc=2).count() == 1
