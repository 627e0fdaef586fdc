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


def test_pred_norm_and_histogram(spark):
    """pred_norm = gap tokens minus EN stopwords, capped at 4, falling back
    to 'related_to' (VERDICT r04 item 5) — golden replay in pure Python;
    the histogram ranks are deterministic and capped at top_k."""
    from unsupervised_ner_spark.ops.textstats import EN_STOPWORDS
    from unsupervised_ner_spark.pipeline.triples import (
        PRED_NORM_MAX_TOKENS,
        predicate_histogram,
    )

    pages = synth_pages(spark, N_PAGES).cache()
    stages = run_pipeline(pages, lang_filter=None)
    rows = stages["triples"].collect()
    sw = set(EN_STOPWORDS)
    for r in rows:
        if r.pred == "related_to":
            assert r.pred_norm == "related_to"
            continue
        toks = [t for t in r.pred.split(" ") if t not in sw][:PRED_NORM_MAX_TOKENS]
        assert r.pred_norm == (" ".join(toks) or "related_to"), (r.pred, r.pred_norm)
    # a stopword-only gap must not leak the raw function word
    assert all(r.pred_norm not in sw for r in rows)

    hist = predicate_histogram(stages["triples"], top_k=3).collect()
    assert hist and all(1 <= h.rank <= 3 for h in hist)
    # rank is dense per type pair and ordered by support then string
    from collections import defaultdict

    by_pair = defaultdict(list)
    for h in hist:
        by_pair[(h.subj_type, h.obj_type)].append(h)
    for pair_rows in by_pair.values():
        pair_rows.sort(key=lambda h: h.rank)
        assert [h.rank for h in pair_rows] == list(range(1, len(pair_rows) + 1))
        keys = [(-h.n_triples, h.pred_norm) for h in pair_rows]
        assert keys == sorted(keys)
