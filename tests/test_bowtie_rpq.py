"""Bow-tie decomposition on a hand graph with a known macro-structure;
RPQ p/q* on a hand triple table with a known closure."""

from __future__ import annotations

from unsupervised_ner_spark.pipeline.er import bowtie_classes, rpq_two_step


def test_bowtie_gadget(spark):
    # CORE 3-cycle c0->c1->c2->c0; small SCC s0<->s1 (must NOT be core);
    # a1 -> a0 -> c0 (IN chain — lexicographically BELOW the cycle so the
    # cycle's color stays internal within the 2-outer-round horizon, the
    # _scc_splice_edges design rule); c2 -> o0 -> o1 (OUT chain); d0 -> d1
    # disconnected from core.
    edges = [
        ("c0", "c1"), ("c1", "c2"), ("c2", "c0"),
        ("s0", "s1"), ("s1", "s0"),
        ("a1", "a0"), ("a0", "c0"),
        ("c2", "o0"), ("o0", "o1"),
        ("d0", "d1"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["cls"] for r in bowtie_classes(df).collect()}
    assert got == {
        "c0": "core", "c1": "core", "c2": "core",
        "a0": "in", "a1": "in",
        "o0": "out", "o1": "out",
        "s0": "other", "s1": "other",
        "d0": "other", "d1": "other",
    }


def test_bowtie_core_tiebreak(spark):
    # Two 2-cycles, equal size: the core is the one with the MIN scc_id
    # (size DESC, scc_id ASC). scc_id is the coloring's max member key,
    # so {a1,a2} -> "a2" beats {z1,z2} -> "z2".
    edges = [("a1", "a2"), ("a2", "a1"), ("z1", "z2"), ("z2", "z1")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["cls"] for r in bowtie_classes(df).collect()}
    assert got == {"a1": "core", "a2": "core", "z1": "other", "z2": "other"}


def test_rpq_two_step(spark):
    # p = "likes" (3 triples), q = "knows" (2) — count DESC picks them.
    # p-edges: x->y, x2->y, y->q3. q-chain: y->z1->z2.
    rows = [
        ("x", "likes", "y"), ("x2", "likes", "y"), ("y", "likes", "q3"),
        ("y", "knows", "z1"), ("z1", "knows", "z2"),
        ("a", "rare", "b"),
    ]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {(r["src"], r["dst"]): r["q_hops"] for r in rpq_two_step(df).collect()}
    assert got == {
        ("x", "y"): 0, ("x2", "y"): 0, ("y", "q3"): 0,
        ("x", "z1"): 1, ("x2", "z1"): 1,
        ("x", "z2"): 2, ("x2", "z2"): 2,
    }


def test_rpq_q_cycle_capped(spark):
    # q-cycle y->u->y: closure is well-defined (min hops, self-pairs
    # dropped), the p/q* product still terminates.
    rows = [
        ("x", "p", "y"), ("x", "p", "y2"), ("x2", "p", "y"),
        ("y", "q", "u"), ("u", "q", "y"),
    ]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {(r["src"], r["dst"]): r["q_hops"] for r in rpq_two_step(df).collect()}
    assert got == {
        ("x", "y"): 0, ("x", "y2"): 0, ("x2", "y"): 0,
        ("x", "u"): 1, ("x2", "u"): 1,
    }
