"""Unit tests for entity_ambiguity, entity_type_matrix, and
triple_snapshot_diff."""

from pyspark.sql import functions as F

from unsupervised_ner_spark.pipeline import er
from unsupervised_ner_spark.pipeline.triples import triple_snapshot_diff


def _typed(spark, rows):
    return spark.createDataFrame(
        rows, ["url", "sent_idx", "mention_idx", "surface", "pred_group"]
    ).withColumn("prediction", F.col("pred_group"))


def test_entity_ambiguity_argmin_tiebreak(spark):
    typed = _typed(
        spark,
        [
            # "washington": 2x LOCATION, 1x PERSON -> top LOCATION
            ("u1", 0, 0, "Washington", "LOCATION"),
            ("u2", 0, 0, "washington!", "LOCATION"),
            ("u3", 0, 0, "WASHINGTON", "PERSON"),
            # "paris": 1x LOCATION, 1x PERSON -> count tie, type asc wins
            ("u1", 1, 0, "Paris", "LOCATION"),
            ("u2", 1, 0, "paris", "PERSON"),
            # unambiguous + an OTHER row that must be ignored
            ("u3", 1, 0, "aspirin", "DRUG"),
            ("u3", 2, 0, "junk", "OTHER"),
        ],
    )
    out = {r["ent"]: r for r in er.entity_ambiguity(typed).collect()}
    assert set(out) == {"washington", "paris", "aspirin"}

    w = out["washington"]
    assert w["n_types"] == 2 and w["n_mentions"] == 3 and w["ambiguous"]
    assert w["top_type"] == "LOCATION" and w["top_n"] == 2

    p = out["paris"]
    assert p["ambiguous"] and p["top_type"] == "LOCATION" and p["top_n"] == 1

    a = out["aspirin"]
    assert not a["ambiguous"] and a["n_types"] == 1 and a["top_n"] == 1


def test_entity_type_matrix_distinct_per_sentence(spark):
    typed = _typed(
        spark,
        [
            # sentence (u1,0): DRUG x2 (distinct collapses), DISEASE x1
            ("u1", 0, 0, "imatinib", "DRUG"),
            ("u1", 0, 1, "aspirin", "DRUG"),
            ("u1", 0, 2, "nsclc", "DISEASE"),
            # sentence (u1,1): same pair again, same doc
            ("u1", 1, 0, "aspirin", "DRUG"),
            ("u1", 1, 1, "flu", "DISEASE"),
            # sentence (u2,0): three types -> three pairs
            ("u2", 0, 0, "bob", "PERSON"),
            ("u2", 0, 1, "acme", "ORG"),
            ("u2", 0, 2, "paris", "LOCATION"),
        ],
    )
    out = {
        (r["type_a"], r["type_b"]): r
        for r in er.entity_type_matrix(typed).collect()
    }
    dd = out[("DISEASE", "DRUG")]
    assert dd["n_sents"] == 2 and dd["n_docs"] == 1
    assert set(out) == {
        ("DISEASE", "DRUG"),
        ("LOCATION", "ORG"),
        ("LOCATION", "PERSON"),
        ("ORG", "PERSON"),
    }


def test_triple_snapshot_diff_statuses(spark):
    # A excludes url%4==3, B excludes url%4==1
    triples = spark.createDataFrame(
        [
            ("0", "s1", "T", "p", "o1", "T"),   # in both -> common
            ("1", "s2", "T", "p", "o2", "T"),   # A only -> removed
            ("3", "s3", "T", "p", "o3", "T"),   # B only -> added
            ("2", "s1", "T", "p", "o1", "T"),   # second support for s1
        ],
        ["url", "subj", "subj_type", "pred_norm", "obj", "obj_type"],
    )
    out = {r["subj"]: r for r in triple_snapshot_diff(triples).collect()}
    s1 = out["s1"]
    assert s1["status"] == "common" and s1["n_a"] == 2 and s1["n_b"] == 2
    assert out["s2"]["status"] == "removed" and out["s2"]["n_b"] == 0
    assert out["s3"]["status"] == "added" and out["s3"]["n_a"] == 0


def test_entity_provenance_diversity(spark):
    typed = _typed(
        spark,
        [
            # "covid" mentioned from 3 docs across 2 domains: b.com wins (2 docs)
            ("1", 0, 0, "Covid", "DISEASE"),
            ("2", 0, 0, "covid", "DISEASE"),
            ("3", 0, 0, "COVID!", "DISEASE"),
            ("3", 1, 0, "covid", "DISEASE"),  # second mention, same doc
            # single-domain entity
            ("1", 1, 0, "aspirin", "DRUG"),
        ],
    )
    dd = spark.createDataFrame(
        [("1", "a.com"), ("2", "b.com"), ("3", "b.com")], ["url", "reg_domain"]
    )
    out = {r["ent"]: r for r in er.entity_provenance(typed, dd).collect()}

    c = out["covid"]
    assert c["n_mentions"] == 4 and c["n_docs"] == 3 and c["n_domains"] == 2
    assert c["top_domain"] == "b.com" and c["top_n"] == 3

    a = out["aspirin"]
    assert a["n_domains"] == 1 and a["top_domain"] == "a.com" and a["top_n"] == 1
