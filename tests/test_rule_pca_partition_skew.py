"""PCA-confidence rule mining (triples.mine_rules_pca) and partition-skew
simulator (layout.partition_skew) branch tests."""

import hashlib

from unsupervised_ner_spark.ops.layout import partition_skew
from unsupervised_ner_spark.pipeline.triples import mine_rules_pca


def _facts(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred_norm string, obj string")


def test_pca_confidence_diverges_on_incomplete_heads(spark):
    # p-facts: (a,b), (c,d); q-facts: (a,b) only. Subject c has NO q-fact,
    # so it leaves the PCA denominator but stays in n_p:
    # fwd p=>q: n_joint=1, n_p=2, n_pca=1 -> conf 0.5, pca_conf 1.0.
    rows = [("a", "p", "b"), ("c", "p", "d"), ("a", "q", "b")]
    out = {
        (r.p, r.q, r.direction): r for r in mine_rules_pca(_facts(spark, rows)).collect()
    }
    r = out[("p", "q", "fwd")]
    assert (r.n_joint, r.n_p, r.n_pca) == (1, 2, 1)
    assert (r.conf_ppm, r.pca_conf_ppm) == (500000, 1000000)


def test_pca_inverse_direction_keys_body_object(spark):
    # inv p=>q means q(y,x) for body p(x,y): PCA denominator counts
    # p-facts whose OBJECT y has some q-fact.
    # p: (e,f), (g,h); q: (f,e). h has no q-fact.
    rows = [("e", "p", "f"), ("g", "p", "h"), ("f", "q", "e")]
    out = {
        (r.p, r.q, r.direction): r for r in mine_rules_pca(_facts(spark, rows)).collect()
    }
    r = out[("p", "q", "inv")]
    assert (r.n_joint, r.n_p, r.n_pca) == (1, 2, 1)
    assert (r.conf_ppm, r.pca_conf_ppm) == (500000, 1000000)


def test_partition_skew_exact_placement(spark):
    rows = [(k,) for k in [1, 1, 1, 2, 3, 3] for _ in range(1)]
    df = spark.createDataFrame(rows, "k long")
    out = partition_skew(df, "k", n_partitions=8).collect()

    def place(key):
        return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % 8

    expected = {}
    for key, cnt in {1: 3, 2: 1, 3: 2}.items():
        p = place(key)
        n_rows, n_keys, mx = expected.get(p, (0, 0, 0))
        expected[p] = (n_rows + cnt, n_keys + 1, max(mx, cnt))
    got = {r.partition: (r.n_rows, r.n_keys, r.max_key_rows) for r in out}
    assert got == expected
    assert sum(v[0] for v in got.values()) == 6
