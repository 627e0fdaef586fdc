"""SCC condensation DAG on the splice gadget; entity top-facts ranking
on a hand support table."""

from __future__ import annotations

from unsupervised_ner_spark.pipeline.er import (
    entity_top_facts,
    scc_condensation,
)


def test_condensation_gadget(spark):
    edges = [
        ("z0-c0", "z0-c1"),
        ("z0-c1", "z0-c2"),
        ("z0-c2", "z0-c0"),
        ("z0-c0", "m0-out"),
        ("a0-in", "z0-c1"),
        ("g0-p", "g0-q"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        (r["scc_a"], r["scc_b"]): r["n_edges"]
        for r in scc_condensation(df, inner_rounds=3, outer_rounds=2)
        .collect()
    }
    # cycle contracts to its max member z0-c2; intra-SCC edges vanish
    assert got == {
        ("z0-c2", "m0-out"): 1,
        ("a0-in", "z0-c2"): 1,
        ("g0-p", "g0-q"): 1,
    }
    # acyclic quotient: no 1- or 2-cycles among condensation edges
    assert all((b, a) not in got for (a, b) in got)


def test_entity_top_facts_ranking(spark):
    rows = [
        # subj, pred, obj, n_support, n_docs
        ("s1", "causes", "hub", 5, 3),
        ("s1", "treats", "rare", 5, 2),   # support tie -> salience breaks
        ("s1", "near", "mid", 2, 1),
        ("s1", "aaaa", "mid2", 1, 1),     # rank 4 -> cut at k=3
        ("s2", "causes", "hub", 1, 1),
        ("hub", "causes", "mid", 4, 2),
    ]
    df = spark.createDataFrame(
        [
            (s, p, o, f"{s[0].upper()}T", "OT", n, d, s, o)
            for s, p, o, n, d in rows
        ],
        "subj_id string, pred string, obj_id string, subj_type string,"
        " obj_type string, n_support long, n_docs long,"
        " subj_repr string, obj_repr string",
    )
    got = {
        (r["subj_id"], r["rnk"]): (r["pred"], r["obj_id"], r["obj_sal"])
        for r in entity_top_facts(df, k=3).collect()
    }
    # salience: hub = 5+1+4 = 10; rare = 5; mid = 2+4 = 6; mid2 = 1
    assert got[("s1", 1)] == ("causes", "hub", 10)
    assert got[("s1", 2)] == ("treats", "rare", 5)
    assert got[("s1", 3)] == ("near", "mid", 6)
    assert ("s1", 4) not in got
    assert got[("s2", 1)] == ("causes", "hub", 10)
    assert got[("hub", 1)] == ("causes", "mid", 6)
