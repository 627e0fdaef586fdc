"""Unit tests for HITS (pipeline/er.py hits), landmark centrality
(er.landmark_centrality) and distant-supervision relation candidates
(pipeline/triples.py relation_candidates) — hand-built frames plus exact
Python replications of the integer recurrences; the corpus-scale parity
gate is check_correctness (kg_hits / kg_landmark_centrality /
kg_relation_candidates)."""

from __future__ import annotations

from pyspark.sql import functions as F

from unsupervised_ner_spark.pipeline import er
from unsupervised_ner_spark.pipeline import triples as T


def _support(spark, pairs):
    rows = [(a, "rel", b) for a, b in pairs]
    return spark.createDataFrame(rows, "subj_id string, pred string, obj_id string")


def _hits_py(pairs, rounds=2, scale=10**6):
    """Exact Python replication of the integer HITS recurrence."""
    nodes = sorted({n for p in pairs for n in p})
    edges = sorted(set(pairs))
    h = {n: scale for n in nodes}
    a = {}
    for _ in range(rounds):
        raw = {n: 0 for n in nodes}
        for s, d in edges:
            raw[d] += h[s]
        mx = max(max(raw.values()), 1)
        a = {n: raw[n] * scale // mx for n in nodes}
        raw = {n: 0 for n in nodes}
        for s, d in edges:
            raw[s] += a[d]
        mx = max(max(raw.values()), 1)
        h = {n: raw[n] * scale // mx for n in nodes}
    return h, a


def test_hits_matches_integer_recurrence(spark):
    # a hub pointing at two authorities, one of which is also pointed at
    # by a second node; plus a weak hub d -> sink-only z.
    pairs = [("hub", "a1"), ("hub", "a2"), ("c", "a1"), ("d", "z")]
    exp_h, exp_a = _hits_py(pairs)
    got = {
        r.node_id: (r.hub_scaled, r.auth_scaled)
        for r in er.hits(_support(spark, pairs), rounds=2).collect()
    }
    assert got == {n: (exp_h[n], exp_a[n]) for n in exp_h}
    # a1 (2 in-edges from good hubs) must out-rank a2 (1 in-edge)
    assert got["a1"][1] > got["a2"][1]
    # hub (points at both top authorities) must out-rank c
    assert got["hub"][0] > got["c"][0]
    # pure authorities have zero hub score
    assert got["a1"][0] == 0 and got["a2"][0] == 0


def test_hits_duplicate_triples_collapse(spark):
    # duplicate (subj, pred, obj) support rows must not double-count:
    # the edge list is DISTINCT (subj_id, obj_id).
    pairs = [("x", "y"), ("x", "y"), ("x", "z")]
    exp_h, exp_a = _hits_py([("x", "y"), ("x", "z")])
    got = {
        r.node_id: (r.hub_scaled, r.auth_scaled)
        for r in er.hits(_support(spark, pairs), rounds=2).collect()
    }
    assert got == {n: (exp_h[n], exp_a[n]) for n in exp_h}
    assert got["y"][1] == got["z"][1]


def _edges(spark, pairs):
    rows = [(a, "T", b, "T", 1, 1) for a, b in pairs]
    return spark.createDataFrame(
        rows,
        "ent_a string, type_a string, ent_b string, type_b string, "
        "n_sents long, n_docs long",
    )


def test_landmark_centrality_path_graph(spark):
    # path a-b-c-d-e: top-degree seeds are the 3 interior nodes (deg 2,
    # ties by key asc: b, c, d). 3 rounds reach everything from each.
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    out = {
        r.ent: (r.seed_rank, r.n_reached, r.harmonic_scaled, r.ecc_bounded)
        for r in er.landmark_centrality(
            _edges(spark, pairs), rounds=3, n_seeds=3
        ).collect()
    }
    s = 10**6
    # c (center): dists {b:1, d:1, a:2, e:2} -> harmonic 2*s + 2*(s//2)
    assert out["c"] == (2, 4, 2 * s + 2 * (s // 2), 2)
    # b: dists {a:1, c:1, d:2, e:3}
    assert out["b"] == (1, 4, 2 * s + s // 2 + s // 3, 3)
    # d mirrors b but ranks 3rd (tie on degree, key asc)
    assert out["d"] == (3, 4, 2 * s + s // 2 + s // 3, 3)


def test_landmark_centrality_disconnected(spark):
    # two components: the seed in the small component only reaches its
    # own side — harmonic closeness stays defined (no infinite distance).
    pairs = [("a", "b"), ("a", "c"), ("a", "d"), ("x", "y"), ("x", "z")]
    out = {
        r.ent: (r.n_reached, r.ecc_bounded)
        for r in er.landmark_centrality(
            _edges(spark, pairs), rounds=3, n_seeds=2
        ).collect()
    }
    assert out["a"] == (3, 1)
    assert out["x"] == (2, 1)


def _typed(spark, rows):
    return spark.createDataFrame(
        rows,
        "url string, sent_idx long, mention_idx long, surface string, "
        "pred_group string",
    )


def _trips(spark, rows):
    return spark.createDataFrame(
        rows,
        "url string, sent_idx long, subj string, subj_type string, "
        "pred string, pred_norm string, obj string, obj_type string",
    )


def test_relation_candidates_labels_and_adjacency(spark):
    typed = _typed(spark, [
        ("u1", 0, 0, "Paris", "LOCATION"),
        ("u1", 0, 1, "France", "LOCATION"),
        ("u1", 0, 2, "Seine", "LOCATION"),
        ("u1", 1, 0, "!!", "PERSON"),        # norm-empty -> dropped
        ("u1", 1, 1, "Macron", "PERSON"),
        ("u1", 1, 2, "Paris", "LOCATION"),
        ("u2", 0, 5, "junk", "OTHER"),       # OTHER -> dropped
    ])
    trips = _trips(spark, [
        ("u1", 0, "Paris", "LOCATION", "capital of", "capital", "France", "LOCATION"),
        ("u9", 3, "Paris", "LOCATION", "is capital", "capital", "France", "LOCATION"),
        ("u9", 4, "Paris", "LOCATION", "sits in", "sits", "France", "LOCATION"),
        ("u9", 5, "PARIS.", "LOCATION", "x", "anchor", "Seine", "LOCATION"),
    ])
    got = {
        (r.url, r.sent_idx, r.idx_a, r.idx_b): (
            r.adjacent, r.silver_pred, r.n_kb_preds, r.kb_sents
        )
        for r in T.relation_candidates(typed, trips).collect()
    }
    # adjacent, in KB under two distinct normalized predicates
    assert got[("u1", 0, 0, 1)] == (1, "capital", 2, 3)
    # NON-adjacent pair labeled via the KB (the Mintz case): Paris->Seine
    # is known from u9 even though u1 sent 0 never extracted it
    assert got[("u1", 0, 0, 2)] == (0, "anchor", 1, 1)
    # adjacent but unknown to the KB -> NA
    assert got[("u1", 0, 1, 2)] == (1, "NA", 0, 0)
    # norm-empty mention dropped: Macron-Paris is ADJACENT after the drop
    assert got[("u1", 1, 1, 2)] == (1, "NA", 0, 0)
    assert len(got) == 4


def test_relation_candidates_surface_normalization(spark):
    # KB keys normalize like ER surfaces: case / punctuation collapse
    typed = _typed(spark, [
        ("u1", 0, 0, "paris", "LOCATION"),
        ("u1", 0, 1, "SEINE!", "LOCATION"),
    ])
    trips = _trips(spark, [
        ("u9", 0, "PARIS.", "LOCATION", "x", "anchor", "Seine", "LOCATION"),
    ])
    rows = T.relation_candidates(typed, trips).collect()
    assert len(rows) == 1 and rows[0].silver_pred == "anchor"
