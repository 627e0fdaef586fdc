"""Unit tests for er.entity_salience and runner.doc_yield."""

from pyspark.sql import functions as F

from unsupervised_ner_spark.pipeline import er
from unsupervised_ner_spark.pipeline.runner import doc_yield


def _typed(spark, rows):
    return spark.createDataFrame(
        rows, ["url", "sent_idx", "mention_idx", "surface", "pred_group"]
    ).withColumn("prediction", F.col("pred_group"))


def test_entity_salience_rank_and_ties(spark):
    typed = _typed(
        spark,
        [
            # doc u1: "acme corp" 2 mentions (first in sent 1),
            # "bob" 1 mention in the lead sentence, one OTHER ignored
            ("u1", 1, 0, "Acme Corp", "ORG"),
            ("u1", 2, 0, "acme  corp!!", "ORG"),  # normalizes to the same ent
            ("u1", 0, 0, "Bob", "PERSON"),
            ("u1", 0, 1, "junk", "OTHER"),
            # doc u2: tie on counts+first_sent -> ent asc breaks it
            ("u2", 0, 0, "alpha", "DRUG"),
            ("u2", 0, 1, "beta", "DRUG"),
        ],
    )
    out = {(r["url"], r["ent"]): r for r in er.entity_salience(typed).collect()}
    assert len(out) == 4  # OTHER row dropped

    acme = out[("u1", "acme corp")]
    assert acme["n_mentions"] == 2 and acme["first_sent"] == 1
    assert acme["salience_rank"] == 1 and not acme["in_lead"]
    bob = out[("u1", "bob")]
    assert bob["salience_rank"] == 2 and bob["in_lead"]

    assert out[("u2", "alpha")]["salience_rank"] == 1
    assert out[("u2", "beta")]["salience_rank"] == 2


def test_doc_yield_zero_fill_and_counts(spark):
    # one page with real extractable content, one empty page (no sentences)
    pages = spark.createDataFrame(
        [
            (
                "p1", None, None,
                "Mesothelioma is caused by exposure to asbestos\nAustin called",
                "en",
            ),
            ("p2", None, None, "", "en"),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = {r["url"]: r for r in doc_yield(pages).collect()}
    assert set(out) == {"p1", "p2"}

    p1 = out["p1"]
    assert p1["n_sents"] == 2
    assert p1["n_mentions"] >= p1["n_typed"] >= p1["n_entities"] >= 1
    # "Mesothelioma is caused by exposure to asbestos" yields a triple
    assert p1["n_triples"] >= 1

    p2 = out["p2"]
    assert (
        p2["n_sents"] == 0 and p2["n_mentions"] == 0 and p2["n_typed"] == 0
        and p2["n_entities"] == 0 and p2["n_triples"] == 0
    )
