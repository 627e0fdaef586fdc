"""Unit tests for the typed motif census (pipeline/er.py motif_census)
and ego-subgraph export (er.ego_subgraph); the corpus-scale parity gates
are kg_motif_census / kg_ego_export."""

from __future__ import annotations

from unsupervised_ner_spark.pipeline import er


def _edges(spark, rows):
    return spark.createDataFrame(
        [(a, ta, b, tb, 1, 1) for a, ta, b, tb in rows],
        "ent_a string, type_a string, ent_b string, type_b string, "
        "n_sents long, n_docs long",
    )


def test_motif_census_sorted_multiset(spark):
    # one DRUG-GENE-DISEASE triangle and one all-LOC triangle: the motif
    # key is the SORTED type multiset, independent of corner order
    rows = [
        ("a", "DRUG", "b", "GENE"), ("b", "GENE", "c", "DISEASE"),
        ("a", "DRUG", "c", "DISEASE"),
        ("x", "LOC", "y", "LOC"), ("y", "LOC", "z", "LOC"),
        ("x", "LOC", "z", "LOC"),
    ]
    tri = er.triangles(_edges(spark, rows))
    out = {r.motif: r for r in er.motif_census(tri).collect()}
    assert set(out) == {"DISEASE|DRUG|GENE", "LOC|LOC|LOC"}
    assert out["DISEASE|DRUG|GENE"].n_triangles == 1
    assert out["LOC|LOC|LOC"].n_triangles == 1
    assert out["LOC|LOC|LOC"].n_corner_a == 1


def test_ego_subgraph_induced_2hop(spark):
    # star center h (degree 3) is the PageRank root; p2 sits 2 hops out,
    # p3 is 3 hops out so the p2-p3 edge is EXCLUDED (p3 outside the
    # 2-hop ball); the l1-l2 edge is induced (both at dist 1)
    rows = [
        ("h", "T", "l1", "T"), ("h", "T", "l2", "T"), ("h", "T", "p1", "T"),
        ("l1", "T", "l2", "T"),
        ("p1", "T", "p2", "T"), ("p2", "T", "p3", "T"),
    ]
    out = er.ego_subgraph(_edges(spark, rows), hops=2).collect()
    assert all(r.root_ent == "h" for r in out)
    got = {(r.ent_a, r.ent_b): (r.dist_a, r.dist_b) for r in out}
    assert got[("h", "l1")] == (0, 1)
    assert got[("l1", "l2")] == (1, 1)
    assert got[("p1", "p2")] == (1, 2)
    assert ("p2", "p3") not in got
    assert len(got) == 5
