"""Unit tests for landmark-sampled Brandes betweenness
(pipeline/er.py landmark_betweenness) — exact hand cases plus a full
integer-arithmetic Python replication; the corpus-scale parity gate is
kg_betweenness."""

from __future__ import annotations

from collections import defaultdict

from unsupervised_ner_spark.pipeline import er

SCALE = 10**6


def _edges(spark, pairs):
    rows = [(a, "T", b, "T") for a, b in pairs]
    return spark.createDataFrame(
        rows, "ent_a string, type_a string, ent_b string, type_b string"
    )


def _py_bc(pairs, rounds=3, n_seeds=3, scale=SCALE):
    """Exact replication of the operator's integer arithmetic and
    tie-breaks (seeds by deg desc then key asc; mul-then-div terms)."""
    adj = defaultdict(list)
    for a, b in pairs:
        adj[f"{a}|T"].append(f"{b}|T")
        adj[f"{b}|T"].append(f"{a}|T")
    deg = {k: len(v) for k, v in adj.items()}
    seeds = sorted(deg, key=lambda k: (-deg[k], k))[:n_seeds]
    out_n: dict = defaultdict(int)
    out_bc: dict = defaultdict(int)
    for s0 in seeds:
        dist = {s0: 0}
        sigma = {s0: 1}
        frontier = [s0]
        for i in range(1, rounds + 1):
            nxt: dict = defaultdict(int)
            for v in frontier:
                for w in adj[v]:
                    nxt[w] += sigma[v]
            new = {w: c for w, c in nxt.items() if w not in dist}
            for w, c in new.items():
                dist[w] = i
                sigma[w] = c
            frontier = list(new)
        delta = {k: 0 for k in dist}
        for d in range(rounds - 1, -1, -1):
            for v in [k for k in dist if dist[k] == d]:
                delta[v] = sum(
                    sigma[v] * (scale + delta[w]) // sigma[w]
                    for w in adj[v]
                    if dist.get(w) == d + 1
                )
        for v in dist:
            if dist[v] > 0:
                out_n[v] += 1
                out_bc[v] += delta[v]
    return {k.split("|")[0]: (out_n[k], out_bc[k]) for k in out_n}


def _run(spark, pairs, **kw):
    return {
        r.ent: (r.n_landmarks, r.bc_scaled)
        for r in er.landmark_betweenness(_edges(spark, pairs), **kw).collect()
    }


def test_betweenness_path_graph(spark):
    # a-b-c: b lies between (a,c) and (c,a) -> bc(b) = 2 * scale exactly
    got = _run(spark, [("a", "b"), ("b", "c")])
    assert got == _py_bc([("a", "b"), ("b", "c")])
    assert got["b"][1] == 2 * SCALE
    assert got["a"][1] == 0 and got["c"][1] == 0


def test_betweenness_diamond_half_credit(spark):
    # diamond a-{b,c}-d: two shortest a->d paths, so from source a each
    # of b and c earns sigma_b*(scale+0)//sigma_d = scale//2 — the
    # fractional div must fire (bc not a multiple of scale)
    pairs = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")]
    got = _run(spark, pairs)
    exp = _py_bc(pairs)
    assert got == exp
    assert any(v[1] % SCALE != 0 for v in got.values())


def test_betweenness_horizon_truncation(spark):
    # a 5-chain with rounds=2: nodes beyond the horizon contribute
    # nothing; replication shares the same truncation
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    got = _run(spark, pairs, rounds=2, n_seeds=2)
    assert got == _py_bc(pairs, rounds=2, n_seeds=2)
