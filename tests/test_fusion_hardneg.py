"""RRF rank fusion (textstats.rrf_fusion) and label-aware hard-negative
mining (simsearch.hard_negatives) tests."""

from unsupervised_ner_spark.ops.simsearch import hard_negatives
from unsupervised_ner_spark.ops.textstats import rrf_fusion


def test_rrf_exact_contributions(spark):
    # Three docs hit the query terms; with k_each large, both runs rank
    # all three, and each doc's rrf_ppm is the exact integer sum
    # 10^6//(60+r1) + 10^6//(60+r2).
    d = spark.createDataFrame(
        [
            (0, "join table spark join"),          # strongest in both
            (1, "join table filler filler"),
            (2, "spark filler filler filler"),
            (3, "nothing relevant here"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in rrf_fusion(d, k_each=10, k=10).collect()}
    assert 3 not in rows  # never hit a query term -> absent from both runs
    r0 = rows[0]
    assert (r0.bm25_rank, r0.tfidf_rank, r0.fused_rank) == (1, 1, 1)
    assert r0.rrf_ppm == 1_000_000 // 61 + 1_000_000 // 61
    for r in rows.values():
        exp = (1_000_000 // (60 + r.bm25_rank) if r.bm25_rank else 0) + (
            1_000_000 // (60 + r.tfidf_rank) if r.tfidf_rank else 0
        )
        assert r.rrf_ppm == exp


def test_rrf_single_run_doc_still_fuses(spark):
    # A doc present in only one run contributes only that run's term:
    # with k_each=1 the two runs can disagree on their single doc.
    d = spark.createDataFrame(
        [
            (0, "join join join join join join"),   # tf-heavy: tfidf loves it
            (1, "join table spark"),                 # 3 distinct terms: bm25 sum wins
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in rrf_fusion(d, k_each=1, k=10).collect()}
    # every emitted row has at least one nonzero rank and exact rrf
    assert all((r.bm25_rank > 0) or (r.tfidf_rank > 0) for r in rows.values())
    assert all(
        r.rrf_ppm
        == (1_000_000 // (60 + r.bm25_rank) if r.bm25_rank else 0)
        + (1_000_000 // (60 + r.tfidf_rank) if r.tfidf_rank else 0)
        for r in rows.values()
    )


def test_hard_negatives_excludes_same_label(spark):
    # query 0 (label 0) at origin-ish; same-label vec 1 is closest but
    # must be excluded; different-label vecs rank by cosine.
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.01], 0),   # same label: excluded
        (2, [0.9, 0.1], 1),     # nearest different-label
        (3, [0.0, 1.0], 1),     # orthogonal
        (4, [0.5, 0.5], 2),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = sorted(
        hard_negatives(emb, n_queries=1, k=3).collect(), key=lambda r: r.rank
    )
    assert [r.neighbor_id for r in out] == [2, 4, 3]
    assert all(r.neighbor_label != r.query_label for r in out)
    assert out[0].query_label == 0
