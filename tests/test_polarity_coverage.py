"""Polarity-aware is-a mining (taxonomy.isa_polarity) and per-type
property coverage (triples.property_coverage) tests."""

from unsupervised_ner_spark.pipeline.taxonomy import isa_polarity
from unsupervised_ner_spark.pipeline.triples import property_coverage


def test_isa_polarity_verdicts(spark):
    sents = spark.createDataFrame(
        [
            ("u1", 0, "Paris is a city"),
            ("u1", 1, "Paris is not a city"),
            ("u2", 0, "Rome is a city"),
            # the such-as extractor strips a literal trailing 's'
            # (the splice's crude plural): "citys", not "cities"
            ("u2", 1, "citys such as Rome are nice"),
            ("u3", 0, "Mozart is not a drug"),
        ],
        "url string, sent_idx long, sent string",
    )
    out = {(r.hypo, r.hyper): r for r in isa_polarity(sents).collect()}
    paris = out[("paris", "city")]
    assert (paris.n_pos, paris.n_neg, paris.verdict) == (1, 1, "contradicted")
    rome = out[("rome", "city")]  # isa + such_as both count positive
    assert (rome.n_pos, rome.n_neg, rome.verdict) == (2, 0, "positive_only")
    mozart = out[("mozart", "drug")]
    assert (mozart.n_pos, mozart.n_neg, mozart.verdict) == (
        0, 1, "negative_only",
    )
    assert len(out) == 3


def test_isa_polarity_patterns_disjoint(spark):
    # a negated sentence must never feed the positive extractor and
    # vice versa
    sents = spark.createDataFrame(
        [("u1", 0, "Asbestos is not a mineral")],
        "url string, sent_idx long, sent string",
    )
    rows = isa_polarity(sents).collect()
    assert len(rows) == 1
    assert rows[0].n_pos == 0 and rows[0].n_neg == 1


def test_property_coverage_exact(spark):
    trip = spark.createDataFrame(
        [
            ("x", "CITY", "capital_of"), ("x", "CITY", "located_in"),
            ("x", "CITY", "capital_of"),  # duplicate fact: one entity
            ("y", "CITY", "capital_of"),
            ("z", "PERSON", "born_in"),
        ],
        "subj string, subj_type string, pred_norm string",
    )
    out = {
        (r.subj_type, r.pred_norm): r
        for r in property_coverage(trip).collect()
    }
    cap = out[("CITY", "capital_of")]
    assert (cap.n_with, cap.n_type_entities, cap.coverage_ppm) == (
        2, 2, 1_000_000,
    )
    loc = out[("CITY", "located_in")]
    assert (loc.n_with, loc.coverage_ppm) == (1, 500_000)
    assert out[("PERSON", "born_in")].coverage_ppm == 1_000_000
