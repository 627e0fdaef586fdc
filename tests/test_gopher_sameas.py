"""Unit tests for Gopher rule flags (ops/textstats.py gopher_flags) and
the owl:sameAs export (pipeline/er.py sameas_ntriples); the corpus-scale
parity gates are txt_gopher_flags / kg_sameas."""

from __future__ import annotations

from unsupervised_ner_spark.ops import textstats
from unsupervised_ner_spark.pipeline import er


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_flags_each_rule(spark):
    docs = _docs(spark, [
        # 0: passes everything — 50 words, mean len 3.68, all-distinct,
        # 4 stopwords (computed to sit inside every default window)
        (0, "the and of to " + " ".join(f"w{i}a" for i in range(46))),
        # 1: too short -> f_wordcount 0
        (1, "the and tiny doc here"),
        # 2: mean word length too long -> f_meanlen 0
        (2, " ".join(["extraordinarily"] * 60)),
        # 3: numeric tokens -> f_alpha 0 (the branch the corpus never hits)
        (3, " ".join(["1234"] * 60)),
        # 4: no stopwords -> f_stopwords 0
        (4, " ".join(f"w{i}" for i in range(60))),
        # 5: one token repeated -> f_lexdiv 0
        (5, " ".join(["the"] * 30 + ["and"] * 30)),
    ])
    out = {r.doc_id: r for r in textstats.gopher_flags(docs).collect()}
    assert out[0].keep == 1
    assert out[1].f_wordcount == 0 and out[1].keep == 0
    assert out[2].f_meanlen == 0 and out[2].f_wordcount == 1
    assert out[3].f_alpha == 0
    assert out[4].f_stopwords == 0 and out[4].f_lexdiv == 1
    assert out[5].f_lexdiv == 0 and out[5].f_stopwords == 1
    # integer sufficient statistics exposed
    assert out[5].n_distinct == 2 and out[5].n_words == 60


def test_gopher_flags_empty_doc(spark):
    out = textstats.gopher_flags(_docs(spark, [(9, "")])).collect()[0]
    assert (out.n_words, out.f_wordcount, out.keep) == (0, 0, 0)


def _aliases(spark, rows):
    return spark.createDataFrame(
        rows,
        "entity_id string, etype string, alias string, n_mentions long, "
        "rank long",
    )


def test_sameas_ntriples_shape(spark):
    import hashlib

    al = _aliases(spark, [
        ("e1", "DRUG", "Aspirin", 5, 1),
        ("e1", "DRUG", "aspirin.", 2, 2),
    ])
    rows = {r.alias: r.ntriple for r in er.sameas_ntriples(al).collect()}
    h = hashlib.md5(b"Aspirin|DRUG").hexdigest()
    assert rows["Aspirin"] == (
        f"<urn:kg:s:{h}> <http://www.w3.org/2002/07/owl#sameAs> "
        "<urn:kg:e:e1> ."
    )
    assert len(rows) == 2 and rows["aspirin."].endswith("<urn:kg:e:e1> .")
