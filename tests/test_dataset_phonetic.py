"""Triple-classification dataset assembly (kgtrain.triple_dataset) and
phonetic blocking keys (er.phonetic_blocking_keys) vs hand oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from unsupervised_ner_spark.ops.kgtrain import triple_dataset
from unsupervised_ner_spark.pipeline.er import (
    phonetic_blocking_keys,
    phonetic_key_col,
)


def test_triple_dataset_labels_and_colocation(spark):
    trips = spark.createDataFrame(
        [
            ("a", "PERSON", "knows", "b", "PERSON"),
            ("a", "PERSON", "knows", "b", "PERSON"),  # dup collapses
            ("c", "ORG", "in", "d", "LOCATION"),
        ],
        "subj string, subj_type string, pred_norm string, "
        "obj string, obj_type string",
    )
    rows = triple_dataset(trips, k=2).collect()
    pos = [r for r in rows if r.label == 1]
    neg = [r for r in rows if r.label == 0]
    assert len(pos) == 2 and all(r.neg_k == 0 for r in pos)
    # <= 2 negatives per positive (hits_true draws excluded), all labeled 0
    assert 0 < len(neg) <= 4 and all(r.neg_k in (1, 2) for r in neg)
    # negatives keep the original obj_type and never equal the true obj
    for r in neg:
        src = next(p for p in pos
                   if (p.subj, p.pred_norm) == (r.subj, r.pred_norm))
        assert r.obj_type == src.obj_type and r.obj != src.obj
    # head-level split co-location: every (subj, pred) has ONE split
    by_head = {}
    for r in rows:
        by_head.setdefault((r.subj, r.pred_norm), set()).add(r.split)
    assert all(len(s) == 1 for s in by_head.values())


def _key(spark, s):
    df = spark.createDataFrame([(s,)], "s string")
    return df.select(phonetic_key_col(F.col("s")).alias("k")).collect()[0].k


def test_phonetic_key_construction(spark):
    # smith / smyth collide (the misspelling channel); smithe too
    assert _key(spark, "smith") == _key(spark, "smyth") == "S530"
    # leading code drop: first letter's own code never repeats
    assert _key(spark, "tb") == "T100"
    # run collapse and zero padding
    assert _key(spark, "bob") == "B000"  # engine variant: vowels deleted
    assert _key(spark, "a") == "A000"
    # non-letters stripped before keying
    assert _key(spark, "o'brien 3rd") == _key(spark, "obrienrd")


def test_phonetic_blocking_stats(spark):
    occ = spark.createDataFrame(
        [("smith",), ("smyth",), ("jones",), ("",)],
        "norm_surface string",
    )
    got = {r.pkey: (r.n_surfaces, r.rep_surface)
           for r in phonetic_blocking_keys(occ).collect()}
    assert got[_key(spark, "smith")] == (2, "smith")
    assert got[_key(spark, "jones")] == (1, "jones")
    assert len(got) == 2


def test_phonetic_pairs_verify_and_cap(spark):
    from unsupervised_ner_spark.pipeline.er import phonetic_pairs

    occ = spark.createDataFrame(
        [("smith",), ("smyth",), ("seamount",), ("jones",), ("",)],
        "norm_surface string",
    )
    rows = phonetic_pairs(occ).collect()
    # smith/smyth share S530 at lev 1; seamount also keys to S530
    # (vowels deleted, MN collapses) but fails the Levenshtein <= 2
    # verify; jones is alone in its bucket
    assert [(r.surf_a, r.surf_b, r.lev) for r in rows] == [
        ("smith", "smyth", 1)
    ]
    # bucket cap: a hot key with > max_bucket surfaces emits no pairs
    hot = spark.createDataFrame(
        [(f"smith{v}",) for v in "aeiou"], "norm_surface string"
    )
    assert phonetic_pairs(hot, max_bucket=4).count() == 0
    assert phonetic_pairs(hot, max_bucket=5).count() > 0
