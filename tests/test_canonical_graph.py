"""End-to-end canonical graph: typed mentions -> ER -> salted occurrence
link -> canonicalized triples (the north-rule deliverable)."""

import pytest
from pyspark.sql import functions as F

from unsupervised_ner_spark.pipeline import er
from unsupervised_ner_spark.pipeline.runner import run_pipeline
from unsupervised_ner_spark.pipeline.synth import synth_pages


@pytest.fixture(scope="module")
def graph(spark):
    pages = synth_pages(spark, 80).cache()
    stages = run_pipeline(pages, lang_filter=None)
    m = stages["tagged"].select(
        "url", "sent_idx", F.posexplode("mentions").alias("mention_idx", "m")
    ).select(
        "url", "sent_idx", "mention_idx",
        F.col("m.surface").alias("surface"),
        F.split(F.col("m.prediction"), r"\[")[0].alias("pred_group"),
    )
    occ = er.entity_occurrences(m).cache()
    entities, membership = er.resolve_entities(occ)
    return {
        "occ": occ,
        "entities": entities.cache(),
        "membership": membership.cache(),
        "triples": stages["triples"].cache(),
    }


def test_salted_link_covers_all_occurrences(spark, graph):
    linked = er.salted_occurrence_link(graph["occ"], graph["membership"])
    # every occurrence links to exactly one entity (salt replication must
    # neither drop nor duplicate)
    assert linked.count() == graph["occ"].count()
    assert linked.groupBy("occurrence_id").count().filter("count > 1").count() == 0
    # linked entity ids are all known
    known = {r.entity_id for r in graph["entities"].select("entity_id").collect()}
    sample = linked.select("entity_id").distinct().collect()
    assert all(r.entity_id in known for r in sample)


def test_canonical_triples(spark, graph):
    ct = er.canonicalize_triples(graph["triples"], graph["membership"])
    rows = ct.collect()
    assert len(rows) > 0
    known = {r.entity_id for r in graph["entities"].select("entity_id").collect()}
    for r in rows[:100]:
        assert r.subj_id in known and r.obj_id in known
        assert r.pred
    # duplicated sentences across pages canonicalize to the SAME entity pair
    pair_counts = (
        ct.groupBy("subj_id", "pred", "obj_id").count().filter("count > 1").count()
    )
    assert pair_counts > 0, "cross-document duplicates should merge onto shared entities"


def test_cooccurrence_edges_counts(spark):
    """Two entities in the same sentence across two docs: one edge with
    n_sents=3, n_docs=2; within-sentence duplicates collapse first; pair
    ordering is the lexicographic ent|etype key."""
    from unsupervised_ner_spark.pipeline.er import cooccurrence_edges

    rows = [
        # url, sent_idx, surface, pred_group (covid + vaccine twice in s0)
        ("u1", 0, "Covid", "DISEASE"), ("u1", 0, "Vaccine", "THERAPEUTIC_OR_PREVENTIVE_PROCEDURE"),
        ("u1", 0, "covid", "DISEASE"),  # dup mention, same sentence
        ("u1", 1, "Covid", "DISEASE"), ("u1", 1, "Vaccine", "THERAPEUTIC_OR_PREVENTIVE_PROCEDURE"),
        ("u2", 0, "covid", "DISEASE"), ("u2", 0, "vaccine", "THERAPEUTIC_OR_PREVENTIVE_PROCEDURE"),
        ("u2", 1, "Paris", "LOCATION"),  # alone in its sentence: no edge
        ("u3", 0, "Ignored", "OTHER"), ("u3", 0, "covid", "DISEASE"),  # OTHER filtered
    ]
    df = spark.createDataFrame(
        rows, "url string, sent_idx long, surface string, pred_group string"
    )
    got = {(r.ent_a, r.type_a, r.ent_b, r.type_b): (r.n_sents, r.n_docs)
           for r in cooccurrence_edges(df).collect()}
    assert got == {
        ("covid", "DISEASE", "vaccine", "THERAPEUTIC_OR_PREVENTIVE_PROCEDURE"): (3, 2),
    }


def test_entity_degree(spark):
    """Degree = distinct neighbors; co-mention mass sums the symmetrized
    edge weights."""
    from unsupervised_ner_spark.pipeline.er import cooccurrence_edges, entity_degree

    rows = [
        ("u1", 0, "Covid", "DISEASE"), ("u1", 0, "Vaccine", "DRUG"),
        ("u1", 1, "Covid", "DISEASE"), ("u1", 1, "Paris", "LOCATION"),
        ("u2", 0, "Covid", "DISEASE"), ("u2", 0, "Vaccine", "DRUG"),
    ]
    df = spark.createDataFrame(
        rows, "url string, sent_idx long, surface string, pred_group string"
    )
    got = {(r.ent, r.etype): (r.degree, r.n_cooc_sents, r.n_cooc_docs)
           for r in entity_degree(cooccurrence_edges(df)).collect()}
    # covid-vaccine edge: n_sents=2 (u1s0, u2s0), n_docs=2; covid-paris: 1,1
    assert got == {
        ("covid", "DISEASE"): (2, 3, 3),
        ("vaccine", "DRUG"): (1, 2, 2),
        ("paris", "LOCATION"): (1, 1, 1),
    }


def test_cooccurrence_npmi_statistics(spark):
    """Weighted edges carry exact integer sufficient statistics and
    with_npmi derives ln(p_ab/(p_a p_b)) / -ln(p_ab) over the sentence
    universe (1.0 at the p_ab=1 degeneracy)."""
    import math

    from unsupervised_ner_spark.pipeline.er import (
        cooccurrence_weighted_edges,
        with_npmi,
    )

    rows = [
        ("u1", 0, "Covid", "DISEASE"), ("u1", 0, "Vaccine", "DRUG"),
        ("u1", 1, "Covid", "DISEASE"),
        ("u2", 0, "Covid", "DISEASE"), ("u2", 0, "Vaccine", "DRUG"),
        ("u2", 1, "Paris", "LOCATION"), ("u2", 1, "Vaccine", "DRUG"),
    ]
    df = spark.createDataFrame(
        rows, "url string, sent_idx long, surface string, pred_group string"
    )
    got = {(r.ent_a, r.ent_b): r.asDict()
           for r in with_npmi(cooccurrence_weighted_edges(df)).collect()}
    # universe: 4 sentences with >=1 entity; covid in 3, vaccine in 3,
    # paris in 1; (covid, vaccine) co-occur in 2, (paris, vaccine) in 1
    cv = got[("covid", "vaccine")]
    assert (cv["n_pair"], cv["n_a"], cv["n_b"], cv["n_total"], cv["n_docs"]) == (2, 3, 3, 4, 2)
    p_ab, p_a, p_b = 2 / 4, 3 / 4, 3 / 4
    assert cv["npmi"] == pytest.approx(
        math.log(p_ab / (p_a * p_b)) / -math.log(p_ab)
    )
    pv = got[("paris", "vaccine")]
    assert (pv["n_pair"], pv["n_a"], pv["n_b"], pv["n_total"]) == (1, 1, 3, 4)
    assert len(got) == 2


def test_entity_cards_stats_and_top_alias(spark):
    from unsupervised_ner_spark.pipeline import er

    occ = spark.createDataFrame(
        [
            # entity X: surfaces "Foo"x2 on u1, "foo"x1 on u2
            ("foo", "T", "Foo", "u1"),
            ("foo", "T", "Foo", "u1"),
            ("foo", "T", "foo", "u2"),
            # entity Y: single surface
            ("bar", "T", "Bar", "u1"),
        ],
        "norm_surface string, etype string, surface string, url string",
    ).withColumn("occurrence_id", F.md5(F.col("surface")))
    membership = spark.createDataFrame(
        [("foo", "T", "E1"), ("bar", "T", "E2")],
        "norm_surface string, etype string, entity_id string",
    )
    out = {r.entity_id: r for r in er.entity_cards(occ, membership).collect()}
    assert out["E1"].n_mentions == 3
    assert out["E1"].n_docs == 2
    assert out["E1"].n_aliases == 2
    assert out["E1"].top_alias == "Foo"  # 2 mentions beats 1; det. tie-break
    assert out["E2"].n_mentions == 1 and out["E2"].top_alias == "Bar"


def test_predicate_pairs_distinct_first(spark):
    tri = spark.createDataFrame(
        [
            # subject A uses born_in twice (collapses) + raised_in
            ("A", "PERSON", "born_in"),
            ("A", "PERSON", "born_in"),
            ("A", "PERSON", "raised_in"),
            # subject B shares the same pair once
            ("B", "PERSON", "born_in"),
            ("B", "PERSON", "raised_in"),
            # same surface, different type: must NOT pair with A/B
            ("A", "ORG", "founded"),
            ("A", "ORG", "raised_in"),
        ],
        "subj string, subj_type string, pred_norm string",
    )
    out = {(r.pred_a, r.pred_b): r.n_subjects for r in er.predicate_pairs(tri).collect()}
    assert out[("born_in", "raised_in")] == 2  # A and B, dup row collapsed
    assert out[("founded", "raised_in")] == 1  # the ORG-typed subject only
    assert len(out) == 2
