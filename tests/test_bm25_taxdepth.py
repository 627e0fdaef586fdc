"""BM25 vs a pure-Python replication; taxonomy_depth on a hand DAG."""

from __future__ import annotations

import math

from unsupervised_ner_spark.ops.textstats import bm25_topk
from unsupervised_ner_spark.pipeline.taxonomy import taxonomy_depth


def test_bm25_matches_python(spark):
    texts = {
        1: "join table spark join join",
        2: "table table table spark filter scan",
        3: "filter scan sort merge window",
        4: "spark join",
        5: "table",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_terms_hit"], r["bm25_i9"], r["rnk"])
        for r in bm25_topk(df, k=10).collect()
    }

    q = ("join", "table", "spark")
    toks = {i: t.split() for i, t in texts.items()}
    n = len(texts)
    total = sum(len(v) for v in toks.values())
    dfc = {
        t: sum(1 for v in toks.values() if t in v) for t in q
    }
    want = {}
    for i, v in toks.items():
        dl = len(v)
        hits = [t for t in q if t in v]
        if not hits:
            continue
        s = 0
        for t in hits:
            tf = v.count(t)
            idf = math.log(1.0 + (n - dfc[t] + 0.5) / (dfc[t] + 0.5))
            val = idf * (tf * 2.2) / (
                tf + 1.2 * (0.25 + 0.75 * dl * n / total)
            ) * 1e9
            s += int(round(val))
        want[i] = (len(hits), s)
    ordered = sorted(want, key=lambda i: (-want[i][1], i))
    want = {
        i: (want[i][0], want[i][1], r + 1) for r, i in enumerate(ordered)
    }
    assert got == want


def test_taxonomy_depth_hand_dag(spark):
    # r1, r2 roots; a under both; b under a (depth 2 via r1/r2);
    # cycle c <-> d trapped (no root ancestor) -> absent
    closure_rows = [
        ("a", "r1", 1), ("a", "r2", 1),
        ("b", "a", 1), ("b", "r1", 2), ("b", "r2", 2),
        ("c", "d", 1), ("d", "c", 1),
    ]
    df = spark.createDataFrame(
        closure_rows, "hypo string, hyper string, hops long"
    )
    got = {
        r["node"]: (r["depth"], r["n_roots"])
        for r in taxonomy_depth(df).collect()
    }
    assert got == {
        "r1": (0, 0), "r2": (0, 0),
        "a": (1, 2), "b": (2, 2),
    }
