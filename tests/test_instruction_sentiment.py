"""Instruction-density detection (textstats.instruction_density) and
entity sentiment (taxonomy.entity_sentiment) tests."""

from unsupervised_ner_spark.ops.textstats import instruction_density
from unsupervised_ner_spark.pipeline.taxonomy import entity_sentiment


def test_instruction_density_flags_cta(spark):
    cta = ("some salad words here\nClick here to subscribe now\n"
           "Please enter your email to continue")
    weak = ("base line of text\nFollow the road\nmore neutral text\n"
            "yet more neutral text\nstill neutral here\nlast neutral line")
    clean = "just ordinary prose with nothing imperative"
    docs = spark.createDataFrame(
        [(1, cta), (2, weak), (3, clean)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in instruction_density(docs).collect()}
    r1 = out[1]
    assert (r1.n_sents, r1.n_imperative, r1.n_second_person) == (3, 2, 1)
    assert r1.imperative_ppm == 2 * 1_000_000 // 3
    assert r1.is_instruction_like == 1
    r2 = out[2]
    assert r2.n_imperative == 1 and r2.n_sents == 6
    assert r2.is_instruction_like == 0  # 1/6 under the 1/5 bar
    assert out[3].n_imperative == 0
    assert out[3].is_instruction_like == 0


def test_instruction_density_needs_second_person(spark):
    # high imperative density but zero second-person tokens: unflagged
    docs = spark.createDataFrame(
        [(1, "Click the button\nSelect an option")],
        "doc_id long, text string",
    )
    r = instruction_density(docs).collect()[0]
    assert r.n_imperative == 2 and r.n_second_person == 0
    assert r.is_instruction_like == 0


def _sents(spark, rows):
    return spark.createDataFrame(
        [(str(i), 0, s) for i, s in enumerate(rows)],
        "url string, sent_idx long, sent string",
    )


def test_entity_sentiment_verdicts(spark):
    rows = [
        "Acme is great",
        "Acme is terrible",      # -> mixed
        "Globex is excellent",   # -> positive
        "Initech is awful",      # -> negative
        "Umbrella stands here",  # -> neutral
    ]
    out = {r.surface: r for r in entity_sentiment(_sents(spark, rows)).collect()}
    assert out["Acme"].verdict == "mixed"
    assert (out["Acme"].n_pos_hits, out["Acme"].n_neg_hits) == (1, 1)
    assert out["Globex"].verdict == "positive"
    assert out["Initech"].verdict == "negative"
    assert out["Umbrella"].verdict == "neutral"
    assert out["Acme"].n_mentions == 2


def test_entity_sentiment_distinct_per_sentence(spark):
    # a repeated name in one sentence earns its hits ONCE
    out = entity_sentiment(
        _sents(spark, ["Acme loves Acme and Acme is great"])
    ).collect()
    by = {r.surface: r for r in out}
    assert by["Acme"].n_mentions == 1
    assert by["Acme"].n_pos_hits == 1
