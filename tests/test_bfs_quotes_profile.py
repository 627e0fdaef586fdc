"""Multi-source BFS distances (vs brute force), temporal as-of lookup,
quotation attribution frames, and the one-pass column profiler."""

from collections import deque

from pyspark.sql import functions as F

from unsupervised_ner_spark.ops.curation import column_profile
from unsupervised_ner_spark.pipeline import er
from unsupervised_ner_spark.pipeline import triples as T


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, "E", b, "E", 1, 1) for a, b in pairs],
        "ent_a string, type_a string, ent_b string, type_b string, n_sents long, n_docs long",
    )


def test_bfs_distances_match_bruteforce(spark):
    # path graph a-b-c-d-e plus hub h touching a, b, c (highest degree)
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
             ("h", "a"), ("h", "b"), ("h", "c")]
    out = {r.ent: r.dist for r in
           er.bfs_distances(_edges(spark, pairs), rounds=3, n_seeds=1).collect()}
    # brute force BFS from the top-degree seed
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seed = sorted(adj, key=lambda k: (-len(adj[k]), k))[0]
    assert seed == "b"  # deg 3 ties b/c/h; key-asc picks b (engine rule)
    dist = {seed: 0}
    q = deque([seed])
    while q:
        u = q.popleft()
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    expect = {k: d for k, d in dist.items() if d <= 3}
    assert out == expect


def test_bfs_multi_seed_min_distance(spark):
    # two components; 2 seeds land on the two highest-degree nodes
    pairs = [("a", "b"), ("a", "c"), ("x", "y"), ("x", "z")]
    out = {r.ent: r.dist for r in
           er.bfs_distances(_edges(spark, pairs), rounds=2, n_seeds=2).collect()}
    assert out == {"a": 0, "x": 0, "b": 1, "c": 1, "y": 1, "z": 1}


def test_facts_asof_covering_only(spark):
    iv = spark.createDataFrame(
        [("s", "T", "p", "o", "T", 0, 10, 12), ("s", "T", "p", "o", "T", 1, 20, 25)],
        "subj string, subj_type string, pred_norm string, obj string, "
        "obj_type string, interval_idx long, valid_from_day long, valid_to_day long",
    )
    assert T.facts_asof(iv, 11).count() == 1
    assert T.facts_asof(iv, 10).collect()[0].interval_idx == 0
    assert T.facts_asof(iv, 15).count() == 0  # retraction gap
    assert T.facts_asof(iv, 25).collect()[0].interval_idx == 1


def test_extract_quotations_frames(spark):
    sents = spark.createDataFrame(
        [
            ("u", 0, '"Hello there," said Alice Smith.'),
            ("u", 1, 'Bob said, "It works."'),
            ("u", 2, 'No quotes here said nobody.'),
            ("u", 3, '"Orphan quote with no speaker."'),
            ("u", 4, 'lowercase speaker said, "ignored" by the grammar?'),
        ],
        "url string, sent_idx long, sent string",
    )
    out = {r.sent_idx: r for r in T.extract_quotations(sents).collect()}
    assert set(out) == {0, 1}
    assert out[0].speaker == "Alice Smith" and out[0].quote == "Hello there,"
    assert out[1].speaker == "Bob" and out[1].quote == "It works."


def test_column_profile_counts(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y"), (4, "x")], "a long, b string"
    )
    out = {r.col_name: r for r in column_profile(df, ["a", "b"]).collect()}
    assert out["a"].n_rows == 4 and out["a"].n_null == 0
    assert out["a"].n_distinct == 3
    assert out["a"].min_s == "1" and out["a"].max_s == "4"
    assert out["b"].n_null == 1 and out["b"].n_distinct == 2
    assert out["b"].min_s == "x" and out["b"].max_s == "y"
