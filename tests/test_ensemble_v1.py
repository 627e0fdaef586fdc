"""v1 text-mode ensemble (aggregate_server.py:87-163) + tokenization-
divergence reconciliation (aggregate_server_json.py:331-348).

The case table below is hand-derived from the reference control flow:
``get_ensembled_entity_frags`` consults servers in fixed order (bio, phi);
the first whose prediction GROUP is in its OWN precedence list wins, with
the two ``override_bio_prediction*`` quirks; positions where neither list
matches hit the reference's ``assert(len(match_arr) == 1)`` — the engine
totalizes that branch to the phi prediction (documented divergence).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from unsupervised_ner_spark.pipeline.ensemble_v1 import (
    V1_BIO_PRECEDENCE,
    V1_PHI_PRECEDENCE,
    ensemble_v1_tags,
    reconciled_token_tags,
    v1_pick_expr,
    variant_tokenized,
)

# (pred_a/bio, pred_b/phi, expected, why)
CASES = [
    # bio group in bio list -> bio wins outright
    ("DISEASE[CANCER]", "PERSON", "DISEASE[CANCER]", "bio list hit, no override"),
    ("GENE", "LOCATION[CITY]", "GENE", "bio list hit, no override"),
    # override 1 (:90-95): phi says SOCIAL_CIRCUMSTANCES or ORGANIZATION ->
    # dual 'PHI_GROUP/BIO_GROUP', GROUPS only (subtypes stripped)
    ("DISEASE[CANCER]", "ORGANIZATION[UNIV]", "ORGANIZATION/DISEASE", "override 1, org"),
    ("GENE", "SOCIAL_CIRCUMSTANCES", "SOCIAL_CIRCUMSTANCES/GENE", "override 1, social"),
    # override 2 (:97-103): bio MEASURE + phi group in phi list -> phi FULL
    # prediction (subtype kept)
    ("MEASURE", "PERSON[DOCTOR]", "PERSON[DOCTOR]", "override 2"),
    ("MEASURE[NUMBER]", "LOCATION", "LOCATION", "override 2 (subtyped bio)"),
    # override 1 beats override 2 when both fire (elif order, :117-120)
    ("MEASURE", "ORGANIZATION", "ORGANIZATION/MEASURE", "override 1 wins the elif"),
    # bio MEASURE but phi group NOT in phi list -> bio keeps it
    ("MEASURE", "DISEASE", "MEASURE", "override 2 guard fails"),
    # bio group NOT in bio list -> phi consulted; phi list hit -> phi wins
    ("PERSON", "OTHER", "OTHER", "phi list hit (OTHER is in v1 phi list)"),
    ("LOCATION", "UNTAGGED_ENTITY[X]", "UNTAGGED_ENTITY[X]", "phi list hit"),
    # neither list matches: reference asserts; engine totalizes to phi
    ("PERSON", "DISEASE", "DISEASE", "reference assert branch, totalized"),
]


def test_v1_pick_case_table(spark):
    lit_arr = lambda xs: F.array(*[F.lit(x) for x in xs])  # noqa: E731
    df = spark.createDataFrame(
        [(a, b, exp) for a, b, exp, _ in CASES], "pred_a string, pred_b string, exp string"
    )
    got = df.select(
        "pred_a", "pred_b", "exp",
        v1_pick_expr(
            F.col("pred_a"), F.col("pred_b"),
            lit_arr(V1_BIO_PRECEDENCE), lit_arr(V1_PHI_PRECEDENCE),
        ).alias("got"),
    ).collect()
    for r in got:
        why = next(w for a, b, e, w in CASES if a == r.pred_a and b == r.pred_b)
        assert r.got == r.exp, f"{r.pred_a} vs {r.pred_b} ({why}): {r.got} != {r.exp}"


def test_v1_reference_lists_differ_from_v2_config():
    """Guard: the v1 server's hard-coded arrays (aggregate_server.py:15-37)
    are NOT the v2 config lists — MEASURE/OBJECT live in the v1 bio list,
    OTHER/UNTAGGED_ENTITY/MEASURE in the v1 phi list."""
    from unsupervised_ner_spark.dims import load_precedence

    v2 = load_precedence()
    assert "MEASURE" in V1_BIO_PRECEDENCE and "MEASURE" not in v2["bio_precedence_arr"]
    assert "OTHER" in V1_PHI_PRECEDENCE and "OTHER" not in v2["phi_precedence_arr"]


def test_variant_tokenizer_diverges(spark):
    s = spark.createDataFrame(
        [("u", 0, "methylprednisolone is a drug . ")], "url string, sent_idx int, sent string"
    )
    [r] = variant_tokenized(s).collect()
    # 18-char word splits into ceil(18/6)=3 pieces
    assert r.sent.split() == ["methyl", "predni", "solone", "is", "a", "drug", "."]


def test_reconciliation_truncates_to_min_length(spark):
    """confirm_same_size_responses twin: positions beyond min(n_a, n_b) are
    dropped. 'internationalization' (20 chars) -> 4 variant pieces, so the
    variant branch has 3 extra tokens; the joined output must have exactly
    the standard branch's token count for that sentence."""
    sents = spark.createDataFrame(
        [("u", 0, "internationalization helps Paris . ")],
        "url string, sent_idx int, sent string",
    )
    out = reconciled_token_tags(sents).collect()
    n_a = 4  # standard tokens: internationalization helps Paris .
    assert len(out) == n_a
    assert sorted(r.token_idx for r in out) == list(range(n_a))
    # the variant branch really did tokenize differently at position 0
    by_idx = {r.token_idx: r for r in out}
    assert by_idx[0].word_a == "internationalization"
    assert by_idx[0].word_b == "intern"


def test_ensemble_v1_tags_bio_shape(spark):
    sents = spark.createDataFrame(
        [("u", 0, "Aspirin treats headaches . ")],
        "url string, sent_idx int, sent string",
    )
    rows = ensemble_v1_tags(sents).orderBy("token_idx").collect()
    assert [r.word for r in rows] == ["Aspirin", "treats", "headaches", "."]
    tags = [r.tag for r in rows]
    # every tag is O or B_/I_-prefixed; any span starts with B_
    assert all(t == "O" or t[:2] in ("B_", "I_") for t in tags)
    seen_b = False
    for t in tags:
        if t.startswith("I_"):
            assert seen_b, "I_ before any B_"
        seen_b = seen_b or t.startswith("B_")


@pytest.mark.parametrize(
    "pred_a,pred_b",
    [("MEASURE", "ORGANIZATION"), ("DISEASE", "PERSON")],
)
def test_v1_pick_is_deterministic(spark, pred_a, pred_b):
    lit_arr = lambda xs: F.array(*[F.lit(x) for x in xs])  # noqa: E731
    df = spark.createDataFrame([(pred_a, pred_b)] * 3, "pred_a string, pred_b string")
    got = {
        r[0]
        for r in df.select(
            v1_pick_expr(
                F.col("pred_a"), F.col("pred_b"),
                lit_arr(V1_BIO_PRECEDENCE), lit_arr(V1_PHI_PRECEDENCE),
            )
        ).collect()
    }
    assert len(got) == 1
