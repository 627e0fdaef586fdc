"""Salted join (layout.salted_join) and IFP merge suggestions
(triples.inverse_functional_merge) tests."""

from unsupervised_ner_spark.ops.layout import salted_join
from unsupervised_ner_spark.pipeline.triples import inverse_functional_merge


def test_salted_join_equals_plain_join(spark):
    facts = spark.createDataFrame(
        [(i, i % 3, i * 10) for i in range(30)],
        "fid long, k long, v long",
    )
    dim = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c"), (9, "unmatched")],
        "dk long, name string",
    )
    out = salted_join(facts, dim, "k", "dk", "fid", n_salt=4).collect()
    plain = facts.join(dim, facts.k == dim.dk).collect()
    key = lambda r: (r.fid, r.dk)
    assert sorted(map(key, out)) == sorted(map(key, plain))
    assert len(out) == 30  # every fact matches exactly once, no dup rows
    assert "_salt" not in out[0].asDict()


def test_salted_join_spreads_hot_key(spark):
    # one hot key: the salt column must take several distinct values
    # across its rows (that spread IS the skew fix)
    from unsupervised_ner_spark.ops.kgtrain import md5_int32
    from pyspark.sql import functions as F

    facts = spark.createDataFrame(
        [(i, 7) for i in range(64)], "fid long, k long"
    )
    salts = (
        facts.select(
            F.pmod(
                md5_int32(
                    F.concat(
                        F.col("k").cast("string"), F.lit(":"),
                        F.col("fid").cast("string"),
                    )
                ),
                F.lit(8),
            ).alias("s")
        )
        .distinct()
        .count()
    )
    assert salts >= 6  # 64 draws over 8 salts: all-but-certain spread


def test_ifp_merge_rule_and_suggestions(spark):
    rows = (
        # 'email': e1..e4 single-subject, 'dup' shared by 2 -> IFP (4/5)
        [("a", "email", "e1"), ("b", "email", "e2"), ("c", "email", "e3"),
         ("d", "email", "e4"), ("x", "email", "dup"), ("y", "email", "dup")]
        # 'likes': both objects multi-subject -> not IFP, excluded
        + [("a", "likes", "w"), ("b", "likes", "w"),
           ("c", "likes", "z"), ("d", "likes", "z")]
    )
    trip = spark.createDataFrame(
        rows, "subj string, pred_norm string, obj string"
    )
    out = inverse_functional_merge(trip).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.pred_norm, r.obj, r.n_subjs) == ("email", "dup", 2)
    assert r.subjs == "x|y"
    assert r.n_objects == 5


def test_ifp_merge_threshold_boundary(spark):
    # 3 single of 4 objects: 3*5 < 4*4 -> NOT IFP, nothing suggested
    rows = [("a", "p", "o1"), ("b", "p", "o2"), ("c", "p", "o3"),
            ("x", "p", "dup"), ("y", "p", "dup")]
    trip = spark.createDataFrame(
        rows, "subj string, pred_norm string, obj string"
    )
    assert inverse_functional_merge(trip).collect() == []
