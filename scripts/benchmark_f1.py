"""NER F1 on the three biomedical benchmark term sets (BASELINE.md target).

The reference scores BC5CDR-chem / BC5CDR-disease / NCBI-disease via an
external harness (README.md:19,64); its term lists are vendored in
resources/benchmark/. Since the real BERT descriptor service is an external
artifact, absolute-F1 reproduction is impossible offline — instead this
harness scores the ENGINE's full typing path (oracle kernel == Spark
pipeline, proven by parity tests) on templated sentences around the
benchmark terms with the deterministic fixture MLM, reporting per-set
P/R/F1 of the consolidated group prediction.

Usage: python scripts/benchmark_f1.py  -> one JSON line + exit 0
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from unsupervised_ner_spark import dims
from unsupervised_ner_spark.descriptors import FixtureDescriptorProvider
from unsupervised_ner_spark.kernel.oracle import OracleTagger

TEMPLATES = [
    "Patients with %s:__entity__ received treatment",
    "A study of %s:__entity__ was published",
    "Doctors observed %s:__entity__ in the cohort",
]

DATASETS = {
    "bc5cdr_chem": "THERAPEUTIC_OR_PREVENTIVE_PROCEDURE",  # CHEMICAL_SUBSTANCE group
    "bc5cdr_disease": "DISEASE",
    "ncbi_disease": "DISEASE",
}

N_TERMS = 200


def evaluate(model: str = "a100") -> dict:
    emap = dims.load_entity_map()
    tagger = OracleTagger(
        FixtureDescriptorProvider.load(model), emap, dims.load_signatures(model)
    )
    out = {}
    for ds, expected_group in DATASETS.items():
        terms = sorted(
            t for t in dims.load_benchmark_terms(ds) if " " not in t and t.isalpha()
        )
        terms = terms[:: max(1, len(terms) // N_TERMS)][:N_TERMS]
        tp = fp = fn = 0
        for i, term in enumerate(terms):
            sent = TEMPLATES[i % len(TEMPLATES)] % term
            r = tagger.tag_sentence(sent)
            assert len(r.mentions) == 1, sent
            pred = r.mentions[0].prediction.split("[")[0]
            if pred == expected_group:
                tp += 1
            elif pred == "OTHER":
                fn += 1  # missed entity
            else:
                fp += 1  # wrong type predicted
                fn += 1
        precision = tp / (tp + fp) if tp + fp else 0.0
        recall = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
        out[ds] = {
            "n_terms": len(terms),
            "precision": round(precision, 4),
            "recall": round(recall, 4),
            "f1": round(f1, 4),
        }
    return out


if __name__ == "__main__":
    print(json.dumps({"model": "a100", "datasets": evaluate()}))
