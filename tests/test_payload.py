"""Reference JSON payload shape (batched_main_NER.py:287-309) from a tagged
sentence — keys, 1-based indexing, per-mention detail sections."""

import json

from unsupervised_ner_spark import dims
from unsupervised_ner_spark.descriptors import FixtureDescriptorProvider
from unsupervised_ner_spark.kernel.oracle import OracleTagger
from unsupervised_ner_spark.kernel.payload import to_reference_json


def _tagger():
    return OracleTagger(
        FixtureDescriptorProvider.load("a100"),
        dims.load_entity_map(),
        dims.load_signatures("a100"),
        punct_terminate=True,
    )


def test_payload_shape_marker_sentence():
    r = _tagger().tag_sentence("Mesothelioma:__entity__ is caused by asbestos:__entity__")
    p = to_reference_json(r)
    assert set(p) == {
        "total_terms_count", "detected_entity_phrases_count", "ner",
        "entity_distribution", "cs_prediction_details", "ci_prediction_details",
        "orig_cs_prediction_details", "orig_ci_prediction_details", "debug",
    }
    assert p["total_terms_count"] == len(r.words)
    assert p["detected_entity_phrases_count"] == 2
    # ner keys are 1-based and dense
    assert sorted(p["ner"]) == list(range(1, len(r.words) + 1))
    assert p["ner"][1] == {"term": "Mesothelioma", "e": r.tags[0]}
    # the detail sections key on the B_ positions only
    b_positions = [i + 1 for i, t in enumerate(r.tags) if t.startswith("B_")]
    for section in ("entity_distribution", "cs_prediction_details",
                    "orig_cs_prediction_details", "orig_ci_prediction_details"):
        assert sorted(p[section]) == b_positions
    ed = p["entity_distribution"][b_positions[0]]
    assert ed["e"] == r.mentions[0].prediction
    assert ed["cs_distribution"][0].keys() == {"e", "confidence", "stypes"}
    assert p["cs_prediction_details"][b_positions[0]]["cs_descs"]
    assert p["orig_cs_prediction_details"][b_positions[0]]["cs_distribution"][0].keys() == {"e", "confidence"}
    json.dumps(p)  # serializable end-to-end


def test_payload_empty_term_uses_empty_literal():
    r = _tagger().tag_sentence("Parkinsons :__entity__")
    p = to_reference_json(r)
    # the bare marker's stripped word is "" -> "empty" (dictify :130)
    assert any(v["term"] == "empty" for v in p["ner"].values())
