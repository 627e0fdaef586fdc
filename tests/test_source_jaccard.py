"""Cross-source KMV Jaccard overlap (sketches.source_jaccard) tests."""

import hashlib

from unsupervised_ner_spark.ops.sketches import source_jaccard


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, s) for i, (s, t) in enumerate(rows)],
        "doc_id long, text string, source string",
    )


def test_identical_vocab_estimates_one(spark):
    d = _docs(spark, [("A", "red green blue"), ("B", "blue red green")])
    r = source_jaccard(d, k=8).collect()[0]
    assert (r.source_a, r.source_b) == ("A", "B")
    assert (r.n_a, r.n_b, r.n_intersect) == (3, 3, 3)
    assert r.exact_jaccard_ppm == 1_000_000
    # full overlap: every merged-sketch hash is in both sketches
    assert r.kmv_matches == r.kmv_k == 3
    assert r.est_jaccard_ppm == 1_000_000 and r.err_ppm == 0


def test_disjoint_vocab_estimates_zero(spark):
    d = _docs(spark, [("A", "aa bb cc"), ("B", "dd ee ff")])
    r = source_jaccard(d, k=8).collect()[0]
    assert r.n_intersect == 0 and r.exact_jaccard_ppm == 0
    assert r.kmv_matches == 0 and r.kmv_k == 6
    assert r.est_jaccard_ppm == 0


def test_kmv_truncation_matches_python_reference(spark):
    # vocabularies larger than k: replicate the estimator in python
    va = [f"w{i}" for i in range(30)]
    vb = [f"w{i}" for i in range(15, 45)]  # overlap 15..29
    d = _docs(spark, [("A", " ".join(va)), ("B", " ".join(vb))])
    k = 8
    r = source_jaccard(d, k=k).collect()[0]

    def h(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16)

    ska = set(sorted(va, key=lambda t: (h(t), t))[:k])
    skb = set(sorted(vb, key=lambda t: (h(t), t))[:k])
    union_hashes = sorted({h(t) for t in ska} | {h(t) for t in skb})[:k]
    both = {h(t) for t in ska} & {h(t) for t in skb}
    matches = sum(1 for x in union_hashes if x in both)
    assert r.kmv_k == len(union_hashes) == k
    assert r.kmv_matches == matches
    assert r.est_jaccard_ppm == matches * 1_000_000 // k
    assert (r.n_a, r.n_b, r.n_intersect) == (30, 30, 15)
    assert r.exact_jaccard_ppm == 15 * 1_000_000 // 45
    assert r.err_ppm == abs(r.est_jaccard_ppm - r.exact_jaccard_ppm)
