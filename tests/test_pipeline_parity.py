"""Distributed-vs-oracle parity: the Spark pipeline must reproduce the
single-process oracle token-for-token (SURVEY.md §5.2), and the declarative
SQL mention variant must agree with the UDF path."""

import pytest

from unsupervised_ner_spark import dims
from unsupervised_ner_spark.descriptors import FixtureDescriptorProvider
from unsupervised_ner_spark.kernel.oracle import OracleTagger, add_term_punct
from unsupervised_ner_spark.pipeline.mentions import (
    sentences_to_tokens,
    tokens_to_mentions,
    with_masks,
)
from unsupervised_ner_spark.pipeline.runner import run_pipeline
from unsupervised_ner_spark.pipeline.synth import synth_pages
from unsupervised_ner_spark.pipeline.text import extract_text, pages_to_sentences

N_PAGES = 60


@pytest.fixture(scope="module")
def pages(spark):
    return synth_pages(spark, N_PAGES).cache()


@pytest.fixture(scope="module")
def stages(pages):
    return run_pipeline(pages, lang_filter=None, detail=True)


@pytest.fixture(scope="module")
def oracle():
    return OracleTagger(
        FixtureDescriptorProvider.load("a100"),
        dims.load_entity_map(),
        dims.load_signatures("a100"),
        punct_terminate=False,
    )


def test_extract_text_byte_identical(spark, pages):
    """input_hint invariant: per-url extracted text byte-identical."""
    import pyspark.sql.functions as F

    df = pages.select(
        "url", extract_text(F.col("html"), F.col("text")).alias("body"), "text", "html"
    )
    rows = df.collect()
    assert len(rows) == N_PAGES
    for r in rows:
        assert r.body is not None and len(r.body) > 0
        if r.text is not None:
            assert r.body == r.text  # pass-through side
        else:
            assert "<p>" not in r.body and "&amp;" not in r.body


def test_sentences_match_oracle_splitting(spark, pages, stages):
    sents = stages["sentences"].collect()
    # rebuild expected: driver-side split of the extracted text
    import pyspark.sql.functions as F

    bodies = {
        r.url: r.body
        for r in pages.select(
            "url", extract_text(F.col("html"), F.col("text")).alias("body")
        ).collect()
    }
    expected = {}
    for url, body in bodies.items():
        for i, line in enumerate(body.split("\n")):
            line_s = line.strip()
            if len(line_s) > 1:
                expected[(url, i)] = add_term_punct(line_s)
    got = {(r.url, r.sent_idx): r.sent for r in sents}
    assert got == expected


def test_tagged_matches_oracle(stages, oracle):
    """Token-level BIO parity + mention-level prediction parity."""
    tagged = stages["tagged"].collect()
    assert len(tagged) > 0
    for row in tagged:
        o = oracle.tag_sentence(row.sent)
        assert row.words == o.words, row.sent
        assert row.span_arr == o.span_arr, row.sent
        assert row.tags == o.tags, row.sent
        assert len(row.mentions) == len(o.mentions)
        for sm, om in zip(row.mentions, o.mentions):
            assert sm.surface == om.surface
            assert sm.masked_sent == om.masked_sentence
            assert sm.ci_probe == om.ci_probe
            assert sm.prediction == om.prediction
            assert [(p.e, p.confidence) for p in sm.pooled] == [
                (e, c) for e, c, _ in om.pooled
            ]


def test_sql_mentions_agree_with_udf_path(spark, stages):
    """The declarative gaps-and-islands variant (pipeline/mentions.py) must
    produce exactly the UDF path's spans, masks, and probes."""
    sentences = stages["sentences"]
    toks = sentences_to_tokens(sentences)
    ments = with_masks(tokens_to_mentions(toks), sentences)
    sql_rows = {
        (r.url, r.sent_idx, r.begin_tok): (
            r.end_tok,
            r.surface,
            r.masked_sent,
            r.ci_probe,
        )
        for r in ments.collect()
    }
    udf_rows = {}
    for row in stages["tagged"].collect():
        for m in row.mentions:
            udf_rows[(row.url, row.sent_idx, m.begin_tok)] = (
                m.end_tok,
                m.surface,
                m.masked_sent,
                m.ci_probe,
            )
    assert sql_rows == udf_rows


def test_triples_shape(stages):
    t = stages["triples"]
    rows = t.collect()
    assert len(rows) > 0
    for r in rows[:50]:
        assert r.subj_type != "OTHER" and r.obj_type != "OTHER"
        assert r.pred
    # flagship example: asbestos-mesothelioma sentences yield a
    # DISEASE -> caused-by chain
    hit = [
        r
        for r in rows
        if r.subj == "Mesothelioma" and "asbestos" in r.obj
    ]
    assert hit, "expected Mesothelioma triple in synth corpus"


def test_pipeline_plan_is_narrow(stages):
    """No Exchange in the physical plan up to token tags (SURVEY.md §4.3)."""
    plan = stages["tags"]._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
