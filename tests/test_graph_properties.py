"""Property tests for the graph analytics operators: random graphs,
brute-force Python reference implementations. Complements the hand-built
cases in test_kg_graph_ops.py and the DuckDB corpus gate."""

from __future__ import annotations

import itertools

from hypothesis import given, settings
from hypothesis import strategies as st


def _edges_strategy():
    # undirected simple graphs over <= 9 nodes, as sorted (a, b) pairs
    nodes = [f"n{i}" for i in range(9)]
    all_pairs = [
        tuple(sorted(p)) for p in itertools.combinations(nodes, 2)
    ]
    return st.sets(st.sampled_from(all_pairs), min_size=0, max_size=18)


def _to_df(spark, pairs):
    rows = [(a, "T", b, "T", 1, 1) for a, b in sorted(pairs)]
    return spark.createDataFrame(
        rows,
        "ent_a string, type_a string, ent_b string, type_b string, "
        "n_sents long, n_docs long",
    )


def _brute_triangles(pairs):
    es = {tuple(sorted(p)) for p in pairs}
    nodes = sorted({n for p in es for n in p})
    out = set()
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            out.add((a, b, c))
    return out


def _brute_common_neighbors(pairs):
    es = {tuple(sorted(p)) for p in pairs}
    adj: dict[str, set[str]] = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for x, y in itertools.combinations(sorted(adj), 2):
        common = len(adj[x] & adj[y])
        if common:
            out[(x, y)] = (
                common, len(adj[x]), len(adj[y]),
                1 if (x, y) in es else 0,
            )
    return out


@settings(max_examples=12, deadline=None)
@given(_edges_strategy())
def test_triangles_both_orientations_match_bruteforce(spark, pairs):
    from unsupervised_ner_spark.pipeline import er

    expected = _brute_triangles(pairs)
    if not pairs:
        return
    df = _to_df(spark, pairs)
    for orient in ("lex", "degree"):
        got = [
            (r.ent_a, r.ent_b, r.ent_c)
            for r in er.triangles(df, orient=orient).collect()
        ]
        assert set(got) == expected, orient
        assert len(got) == len(expected), f"{orient}: duplicates"


@settings(max_examples=12, deadline=None)
@given(_edges_strategy())
def test_common_neighbors_uncapped_matches_bruteforce(spark, pairs):
    from unsupervised_ner_spark.pipeline import er

    if not pairs:
        return
    expected = _brute_common_neighbors(pairs)
    got = {
        (r.ent_x, r.ent_y): (r.n_common, r.deg_x, r.deg_y, r.linked)
        for r in er.common_neighbors(_to_df(spark, pairs), max_degree=10**6).collect()
    }
    assert got == expected


def test_triple_support_incremental_merge(spark):
    """The incremental-ingest contract: per-batch triple_support tables
    over URL-DISJOINT batches merge by pure addition (n_support and
    n_docs sum, representatives take the min) into exactly the full-corpus
    table — so a new crawl dump folds into the support table without
    recomputing history. n_docs is additive ONLY under url-disjointness
    (each url's triples live in exactly one batch); that is the natural
    batch boundary (a dump is a set of new pages)."""
    from pyspark.sql import functions as F

    from unsupervised_ner_spark.pipeline import er

    rows = []
    for u in range(6):
        for s in range(u % 3 + 1):
            rows.append(
                (f"e{u % 2}", "rel", f"e{2 + s % 2}", f"u{u}", s,
                 f"Surf{u}", "T", f"Obj{s}", "T")
            )
    schema = (
        "subj_id string, pred string, obj_id string, url string, "
        "sent_idx long, subj string, subj_type string, obj string, obj_type string"
    )
    full = spark.createDataFrame(rows, schema)
    b1 = full.filter(F.hash("url") % 2 == 0)
    b2 = full.filter(F.hash("url") % 2 != 0)
    merged = (
        er.triple_support(b1).unionByName(er.triple_support(b2))
        .groupBy("subj_id", "pred", "obj_id")
        .agg(
            F.min("subj_type").alias("subj_type"),
            F.min("obj_type").alias("obj_type"),
            F.sum("n_support").cast("long").alias("n_support"),
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.min("subj_repr").alias("subj_repr"),
            F.min("obj_repr").alias("obj_repr"),
        )
    )
    key = lambda r: (r.subj_id, r.pred, r.obj_id)  # noqa: E731
    want = {key(r): r.asDict() for r in er.triple_support(full).collect()}
    got = {key(r): r.asDict() for r in merged.collect()}
    assert got == want
