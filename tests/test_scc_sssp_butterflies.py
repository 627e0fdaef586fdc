"""SCC coloring / weighted SSSP / butterfly counting unit gates.

- scc_coloring (pipeline/er.py) at the ROUND FIXPOINT vs a pure-Python
  Tarjan oracle on seeded random directed graphs — the gated query runs
  a fixed-round prefix (inner=3, outer=2; the BFS-family contract), so
  this test is the proof that the prefix converges to true SCCs when
  given enough rounds.
- the splice gadget (cycle + outlet + intake + DAG pair) resolves with
  the GATED round budget exactly as the query docstring claims,
  including the outlet retiring only in outer round 2.
- sssp_weighted vs a pure-Python Dijkstra under the same integer
  tie-strength metric and the same (deg DESC, key ASC) seed rule.
- butterflies vs brute-force enumeration of document pairs per entity
  pair on a random bipartite incidence.
"""

from __future__ import annotations

import itertools
import random

from unsupervised_ner_spark.pipeline.er import (
    butterflies,
    scc_coloring,
    sssp_weighted,
)


def _tarjan(nodes, edges):
    adj = {n: [] for n in nodes}
    for s, d in edges:
        adj[s].append(d)
    index = {}
    low = {}
    onstack = set()
    stack = []
    out = []
    counter = itertools.count()

    def strong(v):
        # iterative Tarjan (explicit stack) to dodge recursion limits
        work = [(v, 0)]
        while work:
            node, pi = work.pop()
            if pi == 0:
                index[node] = low[node] = next(counter)
                stack.append(node)
                onstack.add(node)
            recurse = False
            for i in range(pi, len(adj[node])):
                w = adj[node][i]
                if w not in index:
                    work.append((node, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in onstack:
                    low[node] = min(low[node], index[w])
            if recurse:
                continue
            if low[node] == index[node]:
                comp = []
                while True:
                    w = stack.pop()
                    onstack.discard(w)
                    comp.append(w)
                    if w == node:
                        break
                out.append(frozenset(comp))
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[node])

    for n in nodes:
        if n not in index:
            strong(n)
    return set(out)


def test_scc_fixpoint_matches_tarjan(spark):
    rng = random.Random(20260819)
    for trial in range(2):
        n = 7
        nodes = [f"n{trial}-{i:02d}" for i in range(n)]
        edges = sorted(
            {
                (rng.choice(nodes), rng.choice(nodes))
                for _ in range(14)
            }
        )
        edges = [(s, d) for s, d in edges if s != d]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = scc_coloring(df, inner_rounds=n, outer_rounds=n).toPandas()
        assert (got["status"] == "scc").all(), "fixpoint run left opens"
        part = {
            frozenset(g["node"]) for _, g in got.groupby("scc_id")
        }
        touched = {x for e in edges for x in e}
        want = {c for c in _tarjan(sorted(touched), edges) }
        assert part == want
        # scc_id is the max member (pivot = max ancestor inside the SCC)
        for sid, g in got.groupby("scc_id"):
            assert sid == max(g["node"])


def test_scc_gadget_round_budget(spark):
    # the splice shape from __spark_entry__._scc_splice_edges, one group
    edges = [
        ("z0-c0", "z0-c1"),
        ("z0-c1", "z0-c2"),
        ("z0-c2", "z0-c0"),
        ("z0-c0", "m0-out"),
        ("a0-in", "z0-c1"),
        ("g0-p", "g0-q"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = (
        scc_coloring(df, inner_rounds=3, outer_rounds=2)
        .toPandas()
        .set_index("node")
    )
    cyc = {"z0-c0", "z0-c1", "z0-c2"}
    for v in cyc:
        assert got.loc[v, "scc_id"] == "z0-c2"
        assert got.loc[v, "round"] == 1
    # the outlet shares the cycle's color, so it cannot retire in round 1
    assert got.loc["m0-out", "status"] == "scc"
    assert got.loc["m0-out", "round"] == 2
    assert got.loc["m0-out", "scc_id"] == "m0-out"
    for v in ["a0-in", "g0-p", "g0-q"]:
        assert got.loc[v, "status"] == "scc"
        assert got.loc[v, "scc_id"] == v


def test_sssp_matches_dijkstra(spark):
    rng = random.Random(7)
    ents = [f"e{i:02d}" for i in range(10)]
    pairs = sorted(
        {tuple(sorted(rng.sample(ents, 2))) for _ in range(18)}
    )
    rows = [
        (a, "T", b, "T", rng.randint(1, 5), 1) for a, b in pairs
    ]
    df = spark.createDataFrame(
        rows,
        "ent_a string, type_a string, ent_b string, type_b string,"
        " n_sents long, n_docs long",
    )
    got = {
        r["ent"]: r["dist"]
        for r in sssp_weighted(df, rounds=12).collect()
    }

    # python twin: same weight, same seed rule
    w = {(a, b): max(1, 4 - ns) for (a, b, ns) in
         [(r[0], r[2], r[4]) for r in rows]}
    adj = {}
    deg = {}
    for (a, b), ww in w.items():
        adj.setdefault(f"{a}|T", []).append((f"{b}|T", ww))
        adj.setdefault(f"{b}|T", []).append((f"{a}|T", ww))
        deg[f"{a}|T"] = deg.get(f"{a}|T", 0) + 1
        deg[f"{b}|T"] = deg.get(f"{b}|T", 0) + 1
    seed = sorted(deg, key=lambda k: (-deg[k], k))[0]
    import heapq

    dist = {seed: 0}
    pq = [(0, seed)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, 1 << 60):
            continue
        for v, ww in adj.get(u, []):
            nd = d + ww
            if nd < dist.get(v, 1 << 60):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    want = {k.split("|")[0]: v for k, v in dist.items()}
    assert got == want


def test_butterflies_bruteforce(spark):
    rng = random.Random(99)
    docs = [f"d{i}" for i in range(8)]
    ents = [f"e{i}" for i in range(6)]
    inc = sorted(
        {(d, e) for d in docs for e in ents if rng.random() < 0.45}
    )
    # pair-level shared-doc counts (what doc_cooccurrence_edges emits)
    by_doc = {}
    for d, e in inc:
        by_doc.setdefault(d, set()).add(e)
    pair_docs = {}
    for d, es in by_doc.items():
        for a, b in itertools.combinations(sorted(es), 2):
            pair_docs.setdefault((a, b), set()).add(d)
    rows = [
        (a, "T", b, "T", len(ds)) for (a, b), ds in sorted(pair_docs.items())
    ]
    df = spark.createDataFrame(
        rows,
        "ent_a string, type_a string, ent_b string, type_b string,"
        " n_docs long",
    )
    got = {
        r["ent"]: (r["n_partners"], r["n_multi_partners"], r["n_bfly"])
        for r in butterflies(df).collect()
    }

    # brute force: butterflies = doc pairs sharing the same entity pair
    want = {}
    for (a, b), ds in pair_docs.items():
        bf = 0
        for d1, d2 in itertools.combinations(sorted(ds), 2):
            assert d1 != d2
            bf += 1
        for e in (a, b):
            p, m, s = want.get(e, (0, 0, 0))
            want[e] = (p + 1, m + (1 if len(ds) >= 2 else 0), s + bf)
    assert got == want
