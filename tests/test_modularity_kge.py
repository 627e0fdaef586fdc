"""Unit tests for Newman modularity (pipeline/er.py modularity) and the
TransE filtered-ranking eval harness (ops/kgtrain.py kge_eval) — exact
hand cases plus a full Python replication of the hash-embedding protocol;
the corpus-scale parity gate is check_correctness (kg_modularity /
kg_kge_eval)."""

from __future__ import annotations

import hashlib

from unsupervised_ner_spark.ops import kgtrain
from unsupervised_ner_spark.pipeline import er

SCALE = 10**6


def _edges(spark, pairs):
    rows = [(a, "T", b, "T", 1, 1) for a, b in pairs]
    return spark.createDataFrame(
        rows,
        "ent_a string, type_a string, ent_b string, type_b string, "
        "n_sents long, n_docs long",
    )


def test_modularity_two_disconnected_triangles(spark):
    # two disconnected triangles: LPA converges to one community each;
    # m=6, per community in=3, deg_sum=6 ->
    # q = 1e6*3//6 - 1e6*36//144 = 500000 - 250000 = 250000 (exact)
    pairs = [("a", "b"), ("b", "c"), ("a", "c"),
             ("x", "y"), ("y", "z"), ("x", "z")]
    rows = er.modularity(_edges(spark, pairs), iterations=4).collect()
    assert len(rows) == 2
    for r in rows:
        assert (r.n_nodes, r.in_edges, r.deg_sum, r.q_ppm) == (3, 3, 6, 250000)


def test_modularity_single_community_is_zero(spark):
    # whole graph = one community => Q = 0 exactly (in = m, deg_sum = 2m)
    pairs = [("a", "b"), ("b", "c"), ("a", "c")]
    rows = er.modularity(_edges(spark, pairs), iterations=4).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_nodes, r.in_edges, r.deg_sum, r.q_ppm) == (3, 3, 6, 0)


def test_modularity_accounting_invariants(spark):
    # bridge graph: whatever LPA decides, the integer accounting must
    # hold: sum(deg_sum) = 2m, sum(in_edges) <= m, and q_ppm recomputes
    # exactly from the reported sufficient statistics
    pairs = [("a", "b"), ("b", "c"), ("a", "c"),
             ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")]
    m = len(pairs)
    rows = er.modularity(_edges(spark, pairs), iterations=4).collect()
    assert sum(r.deg_sum for r in rows) == 2 * m
    assert sum(r.in_edges for r in rows) <= m
    assert sum(r.n_nodes for r in rows) == 6
    for r in rows:
        assert r.q_ppm == (SCALE * r.in_edges) // m - (
            SCALE * r.deg_sum * r.deg_sum
        ) // (4 * m * m)


def _md5_int32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _emb(prefix: str, v: str, dim=4, mod=1000):
    return [_md5_int32(f"{prefix}#{v}#{i}") % mod for i in range(dim)]


def _kge_py(trips, dim=4, mod=1000):
    """Exact Python replication of the filtered-ranking protocol."""
    dtrip = sorted(set(trips))
    vocab = sorted({(s, st) for s, st, p, o, ot in dtrip}
                   | {(o, ot) for s, st, p, o, ot in dtrip})
    truth = {(s, st, p, o, ot) for s, st, p, o, ot in dtrip}
    per_pred: dict[str, list] = {}
    for s, st, p, o, ot in dtrip:
        cands = [c for c, ct in vocab if ct == ot
                 and ((s, st, p, c, ot) not in truth or c == o)]

        def dist(c):
            es, ep, ec = _emb("e", s, dim, mod), _emb("r", p, dim, mod), _emb("e", c, dim, mod)
            return sum(abs(es[i] + ep[i] - ec[i]) for i in range(dim))

        order = sorted(cands, key=lambda c: (dist(c), c))
        rank = order.index(o) + 1
        per_pred.setdefault(p, []).append((len(cands), rank))
    out = {}
    for p, xs in per_pred.items():
        out[p] = (
            len(xs), sum(n for n, _ in xs), sum(r for _, r in xs),
            sum(1 for _, r in xs if r <= 1), sum(1 for _, r in xs if r <= 3),
            sum(1 for _, r in xs if r <= 10),
        )
    return out


def _trips(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, subj_type string, pred_norm string, "
              "obj string, obj_type string")


def test_kge_eval_matches_python_replication(spark):
    rows = [
        ("alice", "PERSON", "works", "acme", "ORG"),
        ("bob", "PERSON", "works", "acme", "ORG"),
        ("alice", "PERSON", "works", "globex", "ORG"),
        ("acme", "ORG", "in", "paris", "LOC"),
        ("bob", "PERSON", "born", "paris", "LOC"),
    ]
    exp = _kge_py([tuple(r) for r in rows])
    got = {
        r.pred_norm: (r.n_test, r.n_cands, r.sum_rank, r.hits1, r.hits3, r.hits10)
        for r in kgtrain.kge_eval(_trips(spark, rows)).collect()
    }
    assert got == exp


def test_kge_eval_filtered_setting(spark):
    # (A,p,B) and (A,p,C): when ranking B, the other TRUE tail C is
    # filtered out, so candidates are {A, B} only (A is a valid
    # corruption: (A,p,A) is not a known fact)
    rows = [
        ("A", "T", "p", "B", "T"),
        ("A", "T", "p", "C", "T"),
    ]
    got = {r.pred_norm: r for r in kgtrain.kge_eval(_trips(spark, rows)).collect()}
    assert got["p"].n_test == 2
    assert got["p"].n_cands == 4  # 2 candidates per test triple
    exp = _kge_py([tuple(r) for r in rows])
    assert (got["p"].n_test, got["p"].n_cands, got["p"].sum_rank,
            got["p"].hits1, got["p"].hits3, got["p"].hits10) == exp["p"]


def _kge_py_distmult(trips, dim=4, mod=1000):
    """Python replication of the DistMult branch: bilinear product score
    ranked DESC (via its negation) under the same filtered protocol."""
    dtrip = sorted(set(trips))
    vocab = sorted({(s, st) for s, st, p, o, ot in dtrip}
                   | {(o, ot) for s, st, p, o, ot in dtrip})
    truth = {(s, st, p, o, ot) for s, st, p, o, ot in dtrip}
    per_pred: dict[str, list] = {}
    for s, st, p, o, ot in dtrip:
        cands = [c for c, ct in vocab if ct == ot
                 and ((s, st, p, c, ot) not in truth or c == o)]

        def key(c):
            es, ep, ec = _emb("e", s, dim, mod), _emb("r", p, dim, mod), _emb("e", c, dim, mod)
            return (-sum(es[i] * ep[i] * ec[i] for i in range(dim)), c)

        order = sorted(cands, key=key)
        rank = order.index(o) + 1
        per_pred.setdefault(p, []).append((len(cands), rank))
    return {
        p: (len(xs), sum(n for n, _ in xs), sum(r for _, r in xs),
            sum(1 for _, r in xs if r <= 1), sum(1 for _, r in xs if r <= 3),
            sum(1 for _, r in xs if r <= 10))
        for p, xs in per_pred.items()
    }


def test_kge_distmult_matches_python_replication(spark):
    # 5 same-type candidate objects: measured ranks diverge between the
    # families (transe 3 vs distmult 4 for ("A","p","o0")) so the test
    # proves the multiplicative score actually changed the ordering.
    rows = [("A", "S", "p", "o0", "T")] + [
        (f"B{j}", "S", "q", f"o{j}", "T") for j in range(4)
    ]
    exp = _kge_py_distmult([tuple(r) for r in rows])
    got = {
        r.pred_norm: (r.n_test, r.n_cands, r.sum_rank, r.hits1, r.hits3, r.hits10)
        for r in kgtrain.kge_eval(
            _trips(spark, rows), score_fn="distmult"
        ).collect()
    }
    assert got == exp
    # the two families must genuinely disagree on at least one ranking
    transe = _kge_py([tuple(r) for r in rows])
    assert exp != transe
