"""Unit tests for integer PageRank (pipeline/er.py pagerank), 2-hop path
enumeration (paths_2hop), line-level dedup (ops/textstats.py line_dedup)
and range search (ops/simsearch.py range_search) — hand-built frames plus
an exact Python replication of the integer PageRank recurrence; the
corpus-scale parity gate is check_correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from unsupervised_ner_spark.ops.simsearch import range_search
from unsupervised_ner_spark.ops.textstats import line_dedup
from unsupervised_ner_spark.pipeline import er


def _edges(spark, pairs):
    rows = [(a, "T", b, "T", 1, 1) for a, b in pairs]
    return spark.createDataFrame(
        rows,
        "ent_a string, type_a string, ent_b string, type_b string, "
        "n_sents long, n_docs long",
    )


def _pagerank_py(pairs, iterations=3, scale=10**9):
    """Exact Python replication of the integer recurrence."""
    adj: dict[str, list[str]] = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    deg = {k: len(v) for k, v in adj.items()}
    r = {k: scale for k in adj}
    tele = 15 * scale // 100
    for _ in range(iterations):
        inc = {k: 0 for k in adj}
        for src, nbs in adj.items():
            c = r[src] // deg[src]
            for d in nbs:
                inc[d] += c
        r = {k: tele + (85 * inc[k]) // 100 for k in adj}
    return r, deg


def test_pagerank_matches_integer_recurrence(spark):
    # star (hub h) + a detached pair: hub must outrank leaves; ranks are
    # bit-exact vs the Python integer replication (no float epsilon).
    pairs = [("h", "l1"), ("h", "l2"), ("h", "l3"), ("x", "y")]
    exp, deg = _pagerank_py(pairs)
    got = {
        r.ent: (r.rank_scaled, r.deg)
        for r in er.pagerank(_edges(spark, pairs)).collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == (exp[k], deg[k]), k
    assert got["h"][0] > got["l1"][0]
    # symmetric pair: equal ranks
    assert got["x"][0] == got["y"][0]


def test_pagerank_mass_roughly_conserved(spark):
    # integer truncation only ever loses mass: total <= n*scale, and not
    # by much on a small graph
    pairs = [("a", "b"), ("b", "c"), ("c", "a")]
    got = er.pagerank(_edges(spark, pairs)).agg(F.sum("rank_scaled")).first()[0]
    assert 3 * 10**9 * 0.99 < got <= 3 * 10**9


def _support(spark, rows):
    return spark.createDataFrame(
        rows,
        "subj_id string, pred string, obj_id string, subj_type string, "
        "obj_type string, n_support long, n_docs long, subj_repr string, "
        "obj_repr string",
    )


def test_paths_2hop_composition_and_cycle_flag(spark):
    rows = [
        ("A", "causes", "B", "T", "T", 1, 2, "a", "b"),
        ("B", "treats", "C", "T", "T", 1, 3, "b", "c"),
        ("B", "treats", "A", "T", "T", 1, 4, "b", "a"),  # closes a cycle
        ("C", "causes", "D", "T", "T", 1, 5, "c", "d"),
    ]
    out = er.paths_2hop(_support(spark, rows)).collect()
    paths = {(r.a_id, r.pred_ab, r.mid_id, r.pred_bc, r.c_id): r for r in out}
    # A->B->C, A->B->A (cycle), B->C->D, B->A->B (cycle through mid A)
    assert set(paths) == {
        ("A", "causes", "B", "treats", "C"),
        ("A", "causes", "B", "treats", "A"),
        ("B", "treats", "C", "causes", "D"),
        ("B", "treats", "A", "causes", "B"),
    }
    assert paths[("A", "causes", "B", "treats", "A")].is_cycle == 1
    assert paths[("A", "causes", "B", "treats", "C")].is_cycle == 0
    p = paths[("A", "causes", "B", "treats", "C")]
    assert (p.n_docs_ab, p.n_docs_bc) == (2, 3)


def test_paths_2hop_hub_middle_capped(spark):
    # middle node H has out-degree 3 > cap=2 -> no paths THROUGH H, but H
    # as an endpoint is untouched
    rows = [("S", "p", "H", "T", "T", 1, 1, "s", "h")] + [
        (f"H", "q", f"O{i}", "T", "T", 1, 1, "h", f"o{i}") for i in range(3)
    ]
    out = er.paths_2hop(_support(spark, rows), max_mid_degree=2).collect()
    assert out == []
    # raise the cap -> the 3 paths appear
    out2 = er.paths_2hop(_support(spark, rows), max_mid_degree=3).collect()
    assert len(out2) == 3


def test_line_dedup_drops_common_lines_keeps_text(spark):
    docs = spark.createDataFrame(
        [
            (1, "COPYRIGHT\nunique one\nfooter"),
            (2, "copyright\nunique two\nfooter"),
            (3, "Copyright \nunique three\nfooter"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in line_dedup(docs, max_df=2).collect()}
    # 'copyright' normalizes identically in 3 docs (case+trim) -> dropped;
    # 'footer' likewise; unique lines kept
    for i, kept in [(1, "unique one"), (2, "unique two"), (3, "unique three")]:
        r = out[i]
        assert (r.n_lines, r.n_kept, r.n_dropped) == (3, 1, 2)
        assert r.kept_chars == len(kept)
    # max_df=3 keeps everything
    out3 = {r.doc_id: r for r in line_dedup(docs, max_df=3).collect()}
    assert all(r.n_dropped == 0 for r in out3.values())


def test_line_dedup_all_dropped_hashes_empty(spark):
    import hashlib

    docs = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "same")], "doc_id long, text string"
    )
    r = line_dedup(docs, max_df=1).filter(F.col("doc_id") == 1).first()
    assert r.n_kept == 0 and r.kept_chars == 0
    assert r.kept_md5 == hashlib.md5(b"").hexdigest()


def test_range_search_matches_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 8).astype("float64")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    tau = 0.3
    got = {
        (r.query_id, r.neighbor_id): r.cos_mil
        for r in range_search(df, n_queries=3, tau=tau).collect()
    }
    exp = {}
    for qi in range(3):
        for ni in range(40):
            if ni == qi:
                continue
            c = float(
                vecs[qi] @ vecs[ni]
                / (np.linalg.norm(vecs[qi]) * np.linalg.norm(vecs[ni]))
            )
            c = round(c, 9)
            if c >= tau:
                exp[(qi, ni)] = int(np.floor(c * 1000))
    assert got == exp and len(exp) > 0


def _kcore_py(pairs, k):
    """Brute-force fixpoint k-core."""
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                changed = True
    return {n: len(v) for n, v in adj.items() if v}


def test_kcore_fixpoint_matches_bruteforce(spark):
    # triangle + pendant CHAIN c-p1-p2-p3: at k=2 the chain unravels one
    # node per round (p3 first, then p2, then p1) — a true cascade that a
    # single fixed round misses and the fixpoint must fully peel
    pairs = [
        ("a", "b"), ("b", "c"), ("a", "c"),        # triangle (the 2-core)
        ("c", "p1"), ("p1", "p2"), ("p2", "p3"),   # pendant chain
    ]
    exp = _kcore_py(pairs, 2)
    assert set(exp) == {"a", "b", "c"}  # sanity: brute force peels the chain
    got = {
        r.ent: r.core_deg
        for r in er.kcore(_edges(spark, pairs), k=2, rounds=None).collect()
    }
    assert got == exp
    # cascade check: after ONE round only p3 is gone; p1,p2 still there
    got1 = {
        r.ent for r in er.kcore(_edges(spark, pairs), k=2, rounds=1).collect()
    }
    assert {"p1", "p2"}.issubset(got1) and "p3" not in got1


def test_graph_components_two_islands(spark):
    pairs = [("a", "b"), ("b", "c"), ("x", "y")]
    rows = er.graph_components(_edges(spark, pairs)).collect()
    comp = {r.ent: (r.component, r.comp_size) for r in rows}
    assert comp["a"] == comp["b"] == comp["c"] == ("a|T", 3)
    assert comp["x"] == comp["y"] == ("x|T", 2)


def test_unigram_stats_counts(spark):
    from unsupervised_ner_spark.ops.textstats import unigram_stats

    docs = spark.createDataFrame(
        [
            (1, "the cat the dog"),
            (2, "the zebra"),
            (3, "THE unique  words"),
        ],
        "doc_id long, text string",
    )
    # corpus tf (lowered): the=4, cat=1, dog=1, zebra=1, unique=1, words=1
    out = {r.doc_id: r for r in unigram_stats(docs).collect()}
    r1 = out[1]
    assert (r1.n_tokens, r1.sum_tf, r1.min_tf) == (4, 4 + 1 + 4 + 1, 1)
    assert (r1.n_hapax, r1.n_rare) == (2, 2)
    r2 = out[2]
    assert (r2.n_tokens, r2.sum_tf, r2.min_tf, r2.n_hapax) == (2, 5, 1, 1)
    r3 = out[3]  # double space collapses; THE lowers into the=4 bucket
    assert (r3.n_tokens, r3.sum_tf, r3.n_hapax) == (3, 6, 2)
