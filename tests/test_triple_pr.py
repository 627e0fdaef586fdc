"""North-rule metric gate: emitted (subj, pred, obj) triples must match the
reference-semantics oracle at P/R >= 0.95 (BASELINE.json "metric").

Golden triples are derived in pure Python from the single-process oracle
(kernel/oracle.py) using the same adjacency rule; the engine side is the
distributed production pipeline. The sets are compared exactly."""

import re

import pytest

from unsupervised_ner_spark import dims
from unsupervised_ner_spark.descriptors import FixtureDescriptorProvider
from unsupervised_ner_spark.kernel.oracle import OracleTagger
from unsupervised_ner_spark.pipeline.runner import run_pipeline
from unsupervised_ner_spark.pipeline.synth import synth_pages
from unsupervised_ner_spark.pipeline.text import extract_text

N_PAGES = 120


def golden_triples_for(tagger, url, sent_idx, sent):
    r = tagger.tag_sentence(sent)
    typed = [m for m in r.mentions if m.prediction != "OTHER"]
    out = []
    for a, b in zip(typed, typed[1:]):
        gap = [
            r.words[i].lower()
            for i in range(a.end_tok + 1, b.begin_tok)
            if re.search(r"[a-z0-9]", r.words[i].lower())
        ]
        pred = " ".join(gap) or "related_to"
        out.append(
            (url, sent_idx, a.surface, a.prediction.split("[")[0], pred,
             b.surface, b.prediction.split("[")[0])
        )
    return out


def test_triple_precision_recall(spark):
    import pyspark.sql.functions as F

    pages = synth_pages(spark, N_PAGES).cache()
    stages = run_pipeline(pages, lang_filter=None)
    engine = {
        (r.url, r.sent_idx, r.subj, r.subj_type, r.pred, r.obj, r.obj_type)
        for r in stages["triples"].collect()
    }
    tagger = OracleTagger(
        FixtureDescriptorProvider.load("a100"),
        dims.load_entity_map(),
        dims.load_signatures("a100"),
        punct_terminate=False,
    )
    golden = set()
    for row in stages["sentences"].collect():
        golden.update(golden_triples_for(tagger, row.url, row.sent_idx, row.sent))

    assert golden, "oracle produced no triples"
    tp = len(engine & golden)
    precision = tp / len(engine) if engine else 0.0
    recall = tp / len(golden)
    assert precision >= 0.95, (precision, len(engine), len(golden))
    assert recall >= 0.95, (recall, len(engine), len(golden))
    # with the shared kernel they should in fact be identical
    assert engine == golden
