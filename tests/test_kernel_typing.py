"""Unit tests for the typing math kernel vs hand-computed reference semantics
(batched_main_NER.py:27-30,579-590,602-702,165-233,457-467)."""

import numpy as np
import pytest

from unsupervised_ner_spark.kernel import typing as T

EMAP = {
    "DISEASE": "DISEASE",
    "DRUG": "THERAPEUTIC_OR_PREVENTIVE_PROCEDURE",
    "THERAPEUTIC_OR_PREVENTIVE_PROCEDURE": "THERAPEUTIC_OR_PREVENTIVE_PROCEDURE",
    "PERSON": "PERSON",
    "OTHER": "OTHER",
    "UNTAGGED_ENTITY": "UNTAGGED_ENTITY",
    "NUMBER": "MEASURE",
    "MEASURE": "MEASURE",
}


def test_softmax_matches_reference_formula():
    # max-subtracted softmax, axis=0 (batched_main_NER.py:27-30)
    x = np.array([10.0, 4.0, 7.0])
    e = np.exp(x - 10.0)
    np.testing.assert_allclose(T.softmax(x), e / e.sum())


def test_normalize_round_4dp_and_zero_sum():
    # convert_positive_nums_to_dist (:579-590)
    assert T.normalize_round([1.0, 1.0, 2.0]) == [0.25, 0.25, 0.5]
    # zero-sum boundary: first factor forced to 1 (:583-585)
    assert T.normalize_round([0.0, 0.0]) == [1.0, 0.0]
    # numpy banker's rounding at 4dp (np.round, not SQL half-up)
    out = T.normalize_round([1.0, 3.0])
    assert out == [0.25, 0.75]


def test_aggregate_single_descriptor():
    descs = [("remedy", 2.0)]
    sigs = [(["DRUG", "DISEASE"], [10, 4])]
    ents, confs, subtypes = T.aggregate_entities(descs, sigs, EMAP)
    # softmax([10,4]) ~ [0.9975, 0.0025]; weighted by 2.0
    soft = T.softmax(np.array([10.0, 4.0]))
    exp_drug = float(soft[0]) * 2.0
    exp_dis = float(soft[1]) * 2.0
    tot = exp_drug + exp_dis
    assert ents[0].startswith("THERAPEUTIC_OR_PREVENTIVE_PROCEDURE[DRUG]")
    assert confs[0] == float(np.round(exp_drug / tot, 4))
    assert subtypes == {
        "THERAPEUTIC_OR_PREVENTIVE_PROCEDURE": {"DRUG": 10},
        "DISEASE": {"DISEASE": 4},
    }


def test_aggregate_suppression_and_other_fallback():
    # all labels suppressed -> {OTHER: 1} (:637-639)
    descs = [("the", 5.0)]
    sigs = [(["UNTAGGED_ENTITY"], [7])]
    ents, confs, subtypes = T.aggregate_entities(descs, sigs, EMAP)
    assert ents == ["OTHER[OTHER]"]
    assert confs == [1.0]
    # suppression off keeps UNTAGGED (skip_untagged, :680-683)
    ents2, _, _ = T.aggregate_entities(descs, sigs, EMAP, suppress_untagged=False)
    assert ents2[0].startswith("UNTAGGED_ENTITY")


def test_subtype_accumulation_across_descriptors():
    # raw counts accumulate across descs (:694-701)
    descs = [("d1", 1.0), ("d2", 1.0)]
    sigs = [(["DRUG"], [10]), (["DRUG", "DISEASE"], [3, 5])]
    _, _, subtypes = T.aggregate_entities(descs, sigs, EMAP)
    assert subtypes["THERAPEUTIC_OR_PREVENTIVE_PROCEDURE"]["DRUG"] == 13
    assert subtypes["DISEASE"]["DISEASE"] == 5


def test_numeric_dummy_descs_zero_sum():
    # 10 x ("two", 0) -> all contributions 0 -> zero-sum -> first factor 1
    descs = [("two", 0.0)] * 10
    sigs = [(["NUMBER"], [10])] * 10
    ents, confs, _ = T.aggregate_entities(descs, sigs, EMAP)
    assert ents == ["MEASURE[NUMBER]"]
    assert confs == [1.0]


def test_pool_confidences_ci_cs_sum():
    pooled = T.pool_confidences(
        ci_entities=["DISEASE[DISEASE]"], ci_confidences=[1.0],
        ci_subtypes={"DISEASE": {"DISEASE": 4}},
        cs_entities=["DISEASE[DISEASE]", "PERSON"], cs_confidences=[0.7, 0.3],
        cs_subtypes={"DISEASE": {"DISEASE": 9}, "PERSON": {"PERSON": 2}},
        blank_probe=False,
    )
    # DISEASE: 1.0 + 0.7 = 1.7; PERSON: 0.3 -> dist [0.85, 0.15]
    assert [(e, c) for e, c, _ in pooled] == [("DISEASE", 0.85), ("PERSON", 0.15)]
    # subtype factors: CS then CI summed (9 + 4)
    assert pooled[0][2] == [("DISEASE", 1.0)]


def test_pool_blank_probe_skips_ci():
    # blank-probe sentences skip CI entirely (:158-173)
    pooled = T.pool_confidences(
        ci_entities=["PERSON"], ci_confidences=[1.0], ci_subtypes={"PERSON": {"PERSON": 5}},
        cs_entities=["DISEASE"], cs_confidences=[1.0], cs_subtypes={"DISEASE": {"DISEASE": 2}},
        blank_probe=True,
    )
    assert [(e, c) for e, c, _ in pooled] == [("DISEASE", 1.0)]


def test_top_prediction_formats():
    # fill_detected_entities (:457-467)
    assert T.top_prediction([("DISEASE", 0.9, [("MENTAL", 1.0)])]) == "DISEASE[MENTAL]"
    assert T.top_prediction([("OTHER", 1.0, [("OTHER", 1.0)])]) == "OTHER"
    assert T.top_prediction([]) == "OTHER"


def test_sort_tie_break_is_label_asc():
    # equal scores break ties by label ASC — the deterministic cross-engine
    # rule shared with typing_sql/oracle_sql (deliberate divergence from the
    # reference's insertion-order stable sort, batched_main_NER.py:636;
    # see kernel/typing.py module docstring)
    descs = [("x", 1.0)]
    sigs = [(["PERSON", "DISEASE"], [5, 5])]  # equal counts -> equal softmax
    ents, confs, _ = T.aggregate_entities(descs, sigs, EMAP)
    assert ents[0].startswith("DISEASE")  # D < P on the tie
    assert confs == [0.5, 0.5]
