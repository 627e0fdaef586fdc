"""Biomedical benchmark F1 gate (BASELINE.md: 'NER F1 reproduced on 3
biomedical sets'). With the deterministic fixture MLM the engine's typing
path scores >= 0.85 F1 per set (misses come from genuine polysemy in the
vendored vocab, e.g. 'bone' BODY_PART vs DISEASE)."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_benchmark_f1_thresholds():
    sys.path.insert(0, str(REPO / "scripts"))
    from benchmark_f1 import evaluate

    results = evaluate("a100")
    assert set(results) == {"bc5cdr_chem", "bc5cdr_disease", "ncbi_disease"}
    for ds, m in results.items():
        assert m["f1"] >= 0.85, (ds, m)
        assert m["n_terms"] >= 150
