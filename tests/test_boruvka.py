"""Borůvka MSF (pipeline/er.py boruvka_msf) at the round fixpoint vs a
pure-Python Kruskal under the identical (w, src>dst-key) total order —
the tie-broken weights make the MSF unique, so the two classical
algorithms must produce the SAME edge set, not merely the same total
weight. The gated query runs the 2-round prefix (the BFS-family
contract); this test proves the scheme converges to the true MSF."""

from __future__ import annotations

import random

from unsupervised_ner_spark.pipeline.er import boruvka_msf


def _kruskal(nodes, wedges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    chosen = []
    for w, ekey, a, b in sorted(wedges):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            chosen.append((a, b, w))
    return set(chosen)


def test_boruvka_matches_kruskal(spark):
    rng = random.Random(42)
    for trial in range(2):
        ents = [f"e{trial}{i:02d}" for i in range(9)]
        pairs = sorted(
            {tuple(sorted(rng.sample(ents, 2))) for _ in range(16)}
        )
        rows = [(a, "T", b, "T", rng.randint(1, 4), 1) for a, b in pairs]
        df = spark.createDataFrame(
            rows,
            "ent_a string, type_a string, ent_b string, type_b string,"
            " n_sents long, n_docs long",
        )
        got = {
            (f'{r["ent_a"]}|{r["type_a"]}', f'{r["ent_b"]}|{r["type_b"]}',
             r["w"])
            for r in boruvka_msf(df, rounds=5).collect()
        }
        wedges = [
            (1_000_000 // ns, f"{a}|T>{b}|T", f"{a}|T", f"{b}|T")
            for a, b, ns in [(r[0], r[2], r[4]) for r in rows]
        ]
        nodes = {x for e in wedges for x in (e[2], e[3])}
        want = _kruskal(nodes, wedges)
        assert got == want
        # forest invariant: |MSF| = n - #components
        assert len(got) <= len(nodes) - 1
