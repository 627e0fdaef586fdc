"""Reference-shaped JSON payload for a tagged sentence.

Replicates the exact response dict the reference NER server returns per
sentence (``final_ret_dict``, batched_main_NER.py:287-309), built from a
``SentenceResult``:

- ``ner``: dictify_ner_response (:115-141) — one entry per token, 1-BASED
  integer keys (JSON serialization stringifies them, same as the
  reference's json.dumps), value {"term": word-or-"empty", "e": BIO tag};
- ``entity_distribution``: per B_-mention pooled distribution
  ({"e": base, "confidence": c, "stypes": {...}} entries — the
  pooled_results values, :299);
- ``cs_prediction_details`` / ``ci_prediction_details``: the raw descriptor
  term lists per mention (:300-302);
- ``orig_cs_prediction_details`` / ``orig_ci_prediction_details``: the
  PACKED per-side distributions (pack_confidences :396-413, :303-304);
- counts (:308). ``debug`` is emitted as an empty list — the reference puts
  its console trace there; this engine's lineage lives in checkpoint
  metrics instead (documented divergence).
"""

from __future__ import annotations

from unsupervised_ner_spark.kernel.oracle import SentenceResult


def _dist_entries(pooled) -> list[dict]:
    return [
        {
            "e": e_class,
            "confidence": conf,
            "stypes": {st: f for st, f in stypes},
        }
        for e_class, conf, stypes in pooled
    ]


def _packed(dist) -> list[dict]:
    return [{"e": e, "confidence": c} for e, c in dist]


def to_reference_json(result: SentenceResult) -> dict:
    ner: dict[int, dict] = {}
    ref_indices: list[int] = []
    for i, (word, tag) in enumerate(zip(result.words, result.tags)):
        pos = i + 1  # 1-based (dictify_ner_response count)
        ner[pos] = {"term": word if word else "empty", "e": tag}
        if tag != "O" and tag.startswith("B_"):
            ref_indices.append(pos)

    entity_distribution: dict[int, dict] = {}
    cs_details: dict[int, dict] = {}
    ci_details: dict[int, dict] = {}
    orig_cs: dict[int, dict] = {}
    orig_ci: dict[int, dict] = {}
    # mentions are emitted in span order; ref_indices align 1:1 with them
    # (assert mirrors the reference's :290 assertion)
    assert len(ref_indices) == len(result.mentions)
    for pos, m in zip(ref_indices, result.mentions):
        e = m.prediction
        entity_distribution[pos] = {"e": e, "cs_distribution": _dist_entries(m.pooled)}
        cs_details[pos] = {"e": e, "cs_descs": list(m.cs_descs)}
        ci_details[pos] = {"ci_descs": list(m.ci_descs)}
        orig_cs[pos] = {"e": e, "cs_distribution": _packed(m.cs_dist)}
        orig_ci[pos] = {"e": e, "cs_distribution": _packed(m.ci_dist)}

    return {
        "total_terms_count": len(ner),
        "detected_entity_phrases_count": len(result.mentions),
        "ner": ner,
        "entity_distribution": entity_distribution,
        "cs_prediction_details": cs_details,
        "ci_prediction_details": ci_details,
        "orig_cs_prediction_details": orig_cs,
        "orig_ci_prediction_details": orig_ci,
        "debug": [],
    }
