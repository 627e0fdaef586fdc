"""Round-6 optimization internals: the salted_join reserved-column guard
and the LPA vote argmax (min-struct aggregate) tie-break semantics."""

import pytest

from pyspark.sql import functions as F

from unsupervised_ner_spark.ops.layout import salted_join
from unsupervised_ner_spark.pipeline.er import label_propagation


def test_salted_join_rejects_reserved_salt_column(spark):
    # the internal working column is collision-proofed (ADVICE r05): an
    # input already carrying it must be rejected loudly, never silently
    # overwritten (which would change the join output vs the plain join)
    facts = spark.createDataFrame(
        [(1, 2, 0)], "fid long, k long, __salted_join_salt int"
    )
    dim = spark.createDataFrame([(2, "a")], "dk long, name string")
    with pytest.raises(ValueError, match="__salted_join_salt"):
        salted_join(facts, dim, "k", "dk", "fid")
    with pytest.raises(ValueError, match="__salted_join_salt"):
        salted_join(
            dim.withColumnRenamed("name", "v"),
            facts.withColumnRenamed("fid", "u"),
            "dk", "k", "v",
        )


def test_salted_join_tolerates_plain_salt_column(spark):
    # a user-level `_salt` column is DATA, not the working column — it
    # must survive the join untouched
    facts = spark.createDataFrame(
        [(i, i % 2, i) for i in range(8)], "fid long, k long, _salt long"
    )
    dim = spark.createDataFrame([(0, "a"), (1, "b")], "dk long, name string")
    out = salted_join(facts, dim, "k", "dk", "fid", n_salt=4)
    rows = out.collect()
    assert len(rows) == 8
    assert sorted(r._salt for r in rows) == list(range(8))


def test_lpa_vote_tie_breaks_by_label_asc(spark):
    # hub x with neighbours a, b, c, d: after ONE round x sees labels
    # {a, b, c, d} each with count 1 — a 4-way tie; the deterministic
    # (count DESC, label ASC) vote must pick "a|T". The round-6 argmax
    # (min(struct(-cnt, lbl))) must realize the identical order.
    edges = spark.createDataFrame(
        [("x", "T", n, "T", 1, 1) for n in ("d", "b", "c", "a")],
        "ent_a string, type_a string, ent_b string, type_b string,"
        " n_sents long, n_docs long",
    )
    out = {
        r.ent: r.community
        for r in label_propagation(edges, iterations=1).collect()
    }
    assert out["x"] == "a|T"
    # each leaf's single neighbour is x, so every leaf takes x's label
    for leaf in ("a", "b", "c", "d"):
        assert out[leaf] == "x|T"


def test_lpa_vote_count_beats_label_order(spark):
    # hub x adjacent to {m, n, p}; m and n also touch b, p also touches
    # a. Round 1: m, n -> "b|T" (min of {x, b}), p -> "a|T", x -> "m|T".
    # Round 2 at x the vote histogram is {b|T: 2, a|T: 1} — the count-2
    # label must win even though "a|T" sorts BEFORE "b|T", proving the
    # min(struct(-cnt, lbl)) aggregate orders by count first.
    pairs = [("x", "m"), ("x", "n"), ("x", "p"),
             ("m", "b"), ("n", "b"), ("p", "a")]
    edges = spark.createDataFrame(
        [(u, "T", v, "T", 1, 1) for u, v in pairs],
        "ent_a string, type_a string, ent_b string, type_b string,"
        " n_sents long, n_docs long",
    )
    out = {
        r.ent: r.community
        for r in label_propagation(edges, iterations=2).collect()
    }
    assert out["x"] == "b|T"
