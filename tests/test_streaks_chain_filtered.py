"""Activity streaks (asof.activity_streaks), chain audit
(er.chain_audit), and filtered vector search (simsearch.filtered_topk)
tests."""

import datetime

from unsupervised_ner_spark.ops.asof import activity_streaks
from unsupervised_ner_spark.ops.simsearch import filtered_topk
from unsupervised_ner_spark.pipeline.er import chain_audit


def _ev(spark, rows):
    base = datetime.datetime(1970, 1, 1, 6)
    return spark.createDataFrame(
        [
            (i, base + datetime.timedelta(days=d), u, "view", 1.0)
            for i, (d, u) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )


def test_streaks_islands_and_longest(spark):
    rows = [(1, 1), (2, 1), (3, 1), (2, 1),  # dup day collapses
            (10, 1), (20, 1), (21, 1)]
    out = {r.user_id: r for r in activity_streaks(_ev(spark, rows)).collect()}
    r = out[1]
    assert r.n_active_days == 6
    assert r.n_streaks == 3
    assert (r.longest_len, r.longest_start_day) == (3, 1)
    assert r.last_streak_len == 2


def test_streaks_tie_prefers_earliest_start(spark):
    rows = [(5, 2), (6, 2), (30, 2), (31, 2)]
    r = activity_streaks(_ev(spark, rows)).collect()[0]
    assert (r.longest_len, r.longest_start_day) == (2, 5)
    assert r.n_streaks == 2 and r.last_streak_len == 2


def test_chain_audit_flags_transitive_clusters(spark):
    clusters = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 200), (5, 200), (9, 300)],
        "doc_id long, cluster_id long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "doc_a long, doc_b long"
    )
    out = {r.cluster_id: r for r in chain_audit(clusters, pairs).collect()}
    assert 300 not in out  # singleton excluded
    chained = out[100]
    assert (chained.n_docs, chained.n_direct) == (3, 2)
    assert chained.completeness_ppm == 666_666
    assert chained.is_chained == 1
    complete = out[200]
    assert complete.completeness_ppm == 1_000_000
    assert complete.is_chained == 0


def test_filtered_topk_prefilters_by_label(spark):
    rows = [
        (0, [1.0, 0.0], 7),   # query, label 7
        (1, [0.9, 0.1], 7),
        (2, [0.0, 1.0], 7),
        (3, [1.0, 0.0], 8),   # identical direction but WRONG label
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = filtered_topk(df, n_queries=1, k=5).collect()
    ids = {r.neighbor_id for r in out}
    assert ids == {1, 2}  # 3 excluded despite perfect cosine
    by_rank = sorted(out, key=lambda r: r.rank)
    assert by_rank[0].neighbor_id == 1
    assert all(r.n_eligible == 2 for r in out)
