"""Exact deciles without a global sort (asof.value_deciles) and
Heaps-law growth checkpoints (textstats.heaps_growth) tests."""

import datetime

from unsupervised_ner_spark.ops.asof import value_deciles
from unsupervised_ner_spark.ops.textstats import heaps_growth


def test_value_deciles_exact_rank_decomposition(spark):
    # 10 users with cent totals 100..1000: one user per decile, richest
    # (user of value 1000) in decile 0 — identical to ntile over
    # (value DESC, user ASC).
    rows = [
        (i, datetime.datetime(2024, 1, 1), i, "buy", (i + 1) * 1.0, "{}")
        for i in range(10)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = sorted(value_deciles(ev).collect(), key=lambda r: r.decile)
    assert [r.n_users for r in out] == [1] * 10
    assert [r.sum_cents for r in out] == [(10 - d) * 100 for d in range(10)]
    total = 5500
    assert [r.share_ppm for r in out] == [
        (10 - d) * 100 * 1_000_000 // total for d in range(10)
    ]
    assert out[-1].cum_share_ppm == sum(r.share_ppm for r in out)


def test_value_deciles_tie_split_across_boundary(spark):
    # 4 equal-value users, 2 deciles' worth each under (rank-1)*10//n:
    # ties split by user_id exactly as a global sort would.
    rows = [
        (i, datetime.datetime(2024, 1, 1), i, "buy", 5.0, "{}")
        for i in range(4)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {r.decile: r.n_users for r in value_deciles(ev).collect()}
    # ranks 1..4 -> deciles (0,2,5,7): one user each
    assert out == {0: 1, 2: 1, 5: 1, 7: 1}


def test_heaps_growth_exact_checkpoints(spark):
    # doc 0: "a b", doc 1: "a c", docs 2-3: "d". Checkpoints:
    # k=0 (doc 0): 2 tokens, vocab {a,b}=2
    # k=1 (docs<2): 4 tokens, vocab {a,b,c}=3
    # k=2 (docs<4): 6 tokens, vocab 4
    d = spark.createDataFrame(
        [(0, "a b"), (1, "a c"), (2, "d"), (3, "d")],
        "doc_id long, text string",
    )
    out = {r.k: r for r in heaps_growth(d).collect()}
    assert set(out) == {0, 1, 2}
    assert (out[0].n_docs, out[0].n_tokens, out[0].vocab) == (1, 2, 2)
    assert (out[1].n_docs, out[1].n_tokens, out[1].vocab) == (2, 4, 3)
    assert (out[2].n_docs, out[2].n_tokens, out[2].vocab) == (4, 6, 4)
