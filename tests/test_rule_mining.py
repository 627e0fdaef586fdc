"""AMIE-style rule mining (pipeline/triples.py mine_rules /
mine_chain_rules) vs hand-computed implications on a toy KG."""

from __future__ import annotations

from unsupervised_ner_spark.pipeline.triples import (
    mine_chain_rules,
    mine_rules,
)


def _facts(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred_norm string, obj string"
    )


def test_mine_rules_fwd_inv_symmetry(spark):
    rows = [
        # capital_of(x,y) always co-occurs with city_in(x,y): fwd rule
        ("paris", "capital_of", "france"),
        ("paris", "city_in", "france"),
        ("rome", "capital_of", "italy"),
        ("rome", "city_in", "italy"),
        # city_in without capital_of: lowers city_in=>capital_of conf
        ("lyon", "city_in", "france"),
        # married_to is symmetric: inv self-rule
        ("ann", "married_to", "bob"),
        ("bob", "married_to", "ann"),
        # reflexive fact must not count as its own inverse
        ("x", "married_to", "x"),
        # duplicate fact collapses in the distinct table
        ("paris", "capital_of", "france"),
    ]
    got = {
        (r.p, r.q, r.direction): (r.n_joint, r.n_p, r.conf_ppm)
        for r in mine_rules(_facts(spark, rows)).collect()
    }
    assert got[("capital_of", "city_in", "fwd")] == (2, 2, 1_000_000)
    assert got[("city_in", "capital_of", "fwd")] == (2, 3, 666_666)
    # symmetry: 2 non-reflexive married_to facts each find their reverse
    assert got[("married_to", "married_to", "inv")] == (2, 3, 666_666)
    assert ("married_to", "married_to", "fwd") not in got  # p<>q only
    assert set(got) == {
        ("capital_of", "city_in", "fwd"),
        ("city_in", "capital_of", "fwd"),
        ("married_to", "married_to", "inv"),
    }


def test_mine_chain_rules_transitivity(spark):
    rows = [
        ("a", "parent", "b"), ("b", "parent", "c"),
        ("a", "grandparent", "c"),
        ("d", "parent", "e"), ("e", "parent", "f"),
        # d->f grandparent missing: body 2, head 1
    ]
    got = {
        (r.p1, r.p2, r.q): (r.n_body, r.n_head, r.conf_ppm)
        for r in mine_chain_rules(_facts(spark, rows)).collect()
    }
    assert got[("parent", "parent", "grandparent")] == (2, 1, 500_000)
    # the composed head itself chains: grandparent(a,c)^... no continuation
    assert all(q != "parent" or (p1, p2) != ("parent", "parent")
               for p1, p2, q in got)


def test_mine_chain_rules_mid_cap(spark):
    # hub z with out-degree 3 > cap 2 is excluded as a mid
    rows = [("s%d" % i, "p", "hub") for i in range(3)] + [
        ("hub", "p", "t%d" % i) for i in range(3)
    ] + [("u", "p", "v"), ("v", "p", "w"), ("u", "q", "w")]
    got = mine_chain_rules(_facts(spark, rows), max_mid_degree=2).collect()
    keys = {(r.p1, r.p2, r.q) for r in got}
    # only the u->v->w wedge survives (hub dropped on both degree sides)
    assert keys == {("p", "p", "q")}
