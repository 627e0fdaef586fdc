"""Densest-subgraph parallel peeling (pipeline/er.py densest_subgraph_peel)
vs an exact Python replication and the planted-clique recovery property."""

from fractions import Fraction

from unsupervised_ner_spark.pipeline import er


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, "E", b, "E", 1, 1) for a, b in pairs],
        "ent_a string, type_a string, ent_b string, type_b string, "
        "n_sents long, n_docs long",
    )


def _peel_py(pairs, rounds=4, eps_num=11, eps_den=10):
    adj: dict[str, set] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    snaps = []
    out = {}
    for r in range(1, rounds + 1):
        e2 = sum(len(adj[v] & alive) for v in alive)
        snaps.append((r - 1, len(alive), e2))
        if not alive:
            break
        peel = {
            v for v in alive
            if len(adj[v] & alive) * len(alive) * eps_den <= eps_num * e2
        }
        for v in peel:
            out[v] = r
        alive -= peel
    e2 = sum(len(adj[v] & alive) for v in alive)
    snaps.append((len(snaps), len(alive), e2))
    for v in alive:
        out[v] = rounds + 1
    nz = [(r, n, e2) for r, n, e2 in snaps if n > 0]
    best = min(
        r for r, n, e2 in nz
        if not any(
            Fraction(te, tn) > Fraction(e2, n)
            or (Fraction(te, tn) == Fraction(e2, n) and tr < r)
            for tr, tn, te in nz
        )
    )
    return {v: (pr, 1 if pr > best else 0) for v, pr in out.items()}


def test_densest_matches_python_replication(spark):
    # planted 5-clique + a sparse path fringe hanging off it
    clique = [f"c{i}" for i in range(5)]
    pairs = [(a, b) for i, a in enumerate(clique) for b in clique[i + 1:]]
    pairs += [("c0", "p1"), ("p1", "p2"), ("p2", "p3"), ("p3", "p4")]
    got = {
        r.ent: (r.peel_round, r.in_best)
        for r in er.densest_subgraph_peel(_edges(spark, pairs)).collect()
    }
    assert got == _peel_py(pairs)


def test_densest_recovers_planted_clique(spark):
    # the in_best flag must isolate the clique from the sparse fringe
    clique = [f"c{i}" for i in range(6)]
    pairs = [(a, b) for i, a in enumerate(clique) for b in clique[i + 1:]]
    fringe = [("c0", "f1"), ("f1", "f2"), ("f2", "f3"), ("f3", "f4"),
              ("f4", "f5"), ("f5", "f6")]
    exp = _peel_py(pairs + fringe)
    best_members = {v for v, (_, b) in exp.items() if b}
    assert best_members == set(clique)  # fixture premise, measured
    got = {
        r.ent
        for r in er.densest_subgraph_peel(
            _edges(spark, pairs + fringe)
        ).collect()
        if r.in_best
    }
    assert got == set(clique)


def test_densest_regular_graph_single_round(spark):
    # a triangle is regular: every degree equals the threshold bound, so
    # round 1 peels everything; the best snapshot is the INITIAL graph
    # (snapshot 0), of which every node is a member — in_best = 1
    pairs = [("a", "b"), ("b", "c"), ("a", "c")]
    got = {
        r.ent: (r.peel_round, r.in_best)
        for r in er.densest_subgraph_peel(_edges(spark, pairs)).collect()
    }
    assert got == {"a": (1, 1), "b": (1, 1), "c": (1, 1)}
