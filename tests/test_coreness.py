"""H-index coreness (pipeline/er.py coreness_hindex): exact Python
replication of the fixed-round H-operator, convergence to the
brute-force peel coreness, and the monotone-decrease property."""

from unsupervised_ner_spark.pipeline import er


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, "E", b, "E", 1, 1) for a, b in pairs],
        "ent_a string, type_a string, ent_b string, type_b string, "
        "n_sents long, n_docs long",
    )


def _adj(pairs):
    adj: dict[str, set] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


def _hindex(vals):
    vals = sorted(vals, reverse=True)
    return max((min(v, i + 1) for i, v in enumerate(vals)), default=0)


def _hrounds_py(pairs, rounds):
    adj = _adj(pairs)
    h = {v: len(adj[v]) for v in adj}
    for _ in range(rounds):
        h = {v: _hindex([h[u] for u in adj[v]]) for v in adj}
    return h


def _coreness_py(pairs):
    """Brute-force peel: core number = largest k such that the node
    survives iterated removal of all degree-<k nodes."""
    adj = _adj(pairs)
    core = {}
    k = 1
    alive = set(adj)
    while alive:
        while True:
            drop = {v for v in alive if len(adj[v] & alive) < k}
            if not drop:
                break
            alive -= drop
        for v in alive:
            core[v] = k  # survives the k-peel; overwritten while it lasts
        k += 1
    return core


def test_coreness_matches_python_hrounds(spark):
    # triangle + pendant path + 4-clique: mixed core numbers 1, 2, 3
    cl = [f"q{i}" for i in range(4)]
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "p1"), ("p1", "p2")]
    pairs += [(x, y) for i, x in enumerate(cl) for y in cl[i + 1:]]
    pairs += [("q0", "a")]
    got = {
        r.ent: r.coreness
        for r in er.coreness_hindex(_edges(spark, pairs), rounds=3).collect()
    }
    assert got == _hrounds_py(pairs, 3)


def test_hindex_rounds_converge_to_exact_coreness():
    # property (Lu et al. 2016): enough H-operator rounds reach the
    # exact brute-force core number, monotonically from above
    cl = [f"q{i}" for i in range(5)]
    pairs = [(x, y) for i, x in enumerate(cl) for y in cl[i + 1:]]
    pairs += [("q0", "t1"), ("t1", "t2"), ("t2", "t0"), ("t0", "t1"),
              ("t2", "w1"), ("w1", "w2")]
    exact = _coreness_py(pairs)
    prev = _hrounds_py(pairs, 0)
    for r in range(1, 12):
        cur = _hrounds_py(pairs, r)
        assert all(cur[v] <= prev[v] for v in cur)  # monotone decrease
        prev = cur
    assert prev == exact


def test_coreness_clique_and_tree(spark):
    # 4-clique: everyone coreness 3 (converged by round 1); a star is a
    # tree: everyone coreness 1
    cl = [f"c{i}" for i in range(4)]
    pairs = [(x, y) for i, x in enumerate(cl) for y in cl[i + 1:]]
    pairs += [("s", f"l{i}") for i in range(4)]
    got = {
        r.ent: r.coreness
        for r in er.coreness_hindex(_edges(spark, pairs), rounds=3).collect()
    }
    for c in cl:
        assert got[c] == 3
    assert got["s"] == 1
    for i in range(4):
        assert got[f"l{i}"] == 1
