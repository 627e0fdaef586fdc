"""Capped min-hop transitive closure (pipeline/taxonomy.py
taxonomy_closure) and transitive reduction vs pure-Python BFS oracles.

Why it exists: the gated Hearst graph at sf0.01 is only 2 levels deep
(the splice chains hypo -> hyper -> hyper2), so the hash gate cannot by
itself prove depth-8 behavior, cycle handling, or the doubling-round
arithmetic (ceil(log2(cap)) min-plus squarings == shortest walk <= cap).
These tests do, on deep chains, rings (cycles), and hypothesis-generated
random digraphs; the reduction's witness rule is checked against a direct
O(V*E) replay.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from unsupervised_ner_spark.pipeline.taxonomy import (
    taxonomy_closure,
    transitive_reduction,
)


def _edges_df(spark, pairs):
    rows = [(a, b, 1, 1, "isa") for a, b in pairs]
    return spark.createDataFrame(
        rows, "hypo string, hyper string, n_sents long, n_docs long, pattern string"
    )


def _bfs_closure(nodes, pairs, cap):
    """Shortest walk length <= cap between distinct nodes, per source."""
    adj = {}
    for a, b in pairs:
        if a != b:
            adj.setdefault(a, set()).add(b)
    out = {}
    for s in nodes:
        dist = {s: 0}
        frontier = [s]
        d = 0
        while frontier and d < cap:
            d += 1
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = d
                        nxt.append(v)
            frontier = nxt
        for t, h in dist.items():
            if t != s and h >= 1:
                out[(s, t)] = h
    return out


def _collect_closure(df):
    return {(r.hypo, r.hyper): r.hops for r in df.collect()}


def test_closure_deep_chain(spark):
    # depth-9 chain: pairs at distance > 8 must be absent, all others min-hop
    pairs = [(f"n{i}", f"n{i+1}") for i in range(9)]
    got = _collect_closure(taxonomy_closure(_edges_df(spark, pairs), max_hops=8))
    assert got[("n0", "n8")] == 8
    assert ("n0", "n9") not in got  # distance 9 > cap
    assert got[("n1", "n9")] == 8
    assert got[("n3", "n5")] == 2
    nodes = {x for p in pairs for x in p}
    assert got == _bfs_closure(nodes, pairs, 8)


def test_closure_ring_cycle(spark):
    # 12-ring: every ordered pair at ring distance <= 8 appears; no self rows
    pairs = [(f"r{i}", f"r{(i + 1) % 12}") for i in range(12)]
    got = _collect_closure(taxonomy_closure(_edges_df(spark, pairs), max_hops=8))
    nodes = {x for p in pairs for x in p}
    assert got == _bfs_closure(nodes, pairs, 8)
    assert all(a != b for a, b in got)
    assert got[("r0", "r8")] == 8 and ("r0", "r9") not in got


def test_closure_and_reduction_random_graphs(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    node = st.integers(min_value=0, max_value=7).map(lambda i: f"v{i}")

    @settings(max_examples=8, deadline=None)
    @given(st.lists(st.tuples(node, node), min_size=0, max_size=16))
    def run(pairs):
        pairs = [(a, b) for a, b in pairs if a != b]
        nodes = {x for p in pairs for x in p}
        edges = _edges_df(spark, pairs) if pairs else _edges_df(
            spark, [("x", "x")]
        ).filter(F.lit(False))
        expect = _bfs_closure(nodes, set(pairs), 8)
        got = _collect_closure(taxonomy_closure(edges, max_hops=8))
        assert got == expect
        # reduction: edge (a,b) redundant iff some m has (a,m),(m,b) in closure
        red = {
            (r.hypo, r.hyper): r.redundant
            for r in transitive_reduction(edges, max_hops=8).collect()
        }
        dedup = set(pairs)
        assert set(red) == dedup
        for a, b in dedup:
            wit = any(
                (a, m) in expect and (m, b) in expect
                for m in nodes
            )
            assert red[(a, b)] == (1 if wit else 0), (a, b)

    run()


def test_reduction_diamond(spark):
    # a->b, b->c, a->c : the skip edge is redundant, the others are not;
    # duplicate edge rows collapse with summed support
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("a", "b")]
    rows = {
        (r.hypo, r.hyper): (r.n, r.redundant)
        for r in transitive_reduction(_edges_df(spark, pairs)).collect()
    }
    assert rows == {
        ("a", "b"): (2, 0),
        ("b", "c"): (1, 0),
        ("a", "c"): (1, 1),
    }
