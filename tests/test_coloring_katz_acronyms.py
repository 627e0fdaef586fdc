"""Jones-Plassmann coloring (er.jp_coloring) vs an exact Python
replication + proper-coloring invariants; truncated Katz (er.katz_index)
vs brute-force walk counting; acronym extraction (taxonomy.acronym_pairs)
validation branches."""

import hashlib

from pyspark.sql import functions as F

from unsupervised_ner_spark.pipeline import er
from unsupervised_ner_spark.pipeline.taxonomy import acronym_pairs


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, "E", b, "E", 1, 1) for a, b in pairs],
        "ent_a string, type_a string, ent_b string, type_b string, "
        "n_sents long, n_docs long",
    )


def _prio(ent):
    return int(hashlib.md5(f"{ent}|E".encode()).hexdigest()[:8], 16)


def _coloring_py(pairs, rounds):
    adj: dict[str, set] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    und = set(adj)
    color: dict[str, int] = {}
    out = {}
    for r in range(1, rounds + 1):
        win = {
            v for v in und
            if all(
                (_prio(v), f"{v}|E") < (_prio(u), f"{u}|E")
                for u in adj[v] & und
            )
        }
        newc = {}
        for v in win:
            used = sorted({color[u] for u in adj[v] if u in color})
            mex = 0
            for x in used:
                if x == mex:
                    mex += 1
            newc[v] = mex
            out[v] = ("colored", r, mex)
        color.update(newc)
        und -= win
    for v in und:
        out[v] = ("open", rounds, -1)
    return out


PAIRS = [
    ("a", "b"), ("b", "c"), ("c", "d"),
    ("x", "y"), ("y", "z"), ("x", "z"),
    ("h", "p"), ("h", "q"), ("h", "s"), ("p", "q"),
]


def test_coloring_matches_python_replication(spark):
    got = {
        r.ent: (r.status, r.round, r.color)
        for r in er.jp_coloring(_edges(spark, PAIRS), rounds=3).collect()
    }
    assert got == _coloring_py(PAIRS, 3)
    # the fixture must exercise a nonzero mex and (with few rounds on the
    # triangle+clique mix) is allowed 'open' leftovers
    assert any(c > 0 for (_, _, c) in got.values())


def test_coloring_is_proper(spark):
    got = {
        r.ent: r.color
        for r in er.jp_coloring(_edges(spark, PAIRS), rounds=6).collect()
        if r.status == "colored"
    }
    adj = set(PAIRS) | {(b, a) for a, b in PAIRS}
    for a, b in adj:
        if a in got and b in got:
            assert got[a] != got[b], (a, b)
    # greedy bound: color <= degree
    deg: dict[str, int] = {}
    for a, b in PAIRS:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    for v, c in got.items():
        assert 0 <= c <= deg[v]


def test_coloring_open_at_short_horizon(spark):
    # a 5-path forces >= 2 rounds; with rounds=1 only round-1 winners
    # are colored and the rest report ('open', 1, -1)
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    rows = er.jp_coloring(_edges(spark, pairs), rounds=1).collect()
    statuses = {r.ent: (r.status, r.round, r.color) for r in rows}
    assert any(s == ("open", 1, -1) for s in statuses.values())
    assert all(
        s in (("open", 1, -1), ("colored", 1, 0)) for s in statuses.values()
    )


def _katz_py(pairs, cap):
    adj: dict[str, set] = {}
    for a, b in pairs:
        ka, kb = f"{a}|E", f"{b}|E"
        adj.setdefault(ka, set()).add(kb)
        adj.setdefault(kb, set()).add(ka)
    ok = {v for v in adj if len(adj[v]) <= cap}
    out = {}
    for a in adj:
        for b in adj:
            if a >= b:
                continue
            n1 = 1 if b in adj[a] else 0
            n2 = sum(1 for m in adj[a] if m in ok and b in adj[m])
            n3 = sum(
                1
                for m in adj[a] if m in ok
                for n in adj[m] if n in ok and b in adj[n]
            )
            if n1 or n2 or n3:
                out[(a, b)] = (n1, n2, n3,
                               500000 * n1 + 250000 * n2 + 125000 * n3)
    return out


def test_katz_matches_bruteforce(spark):
    # triangle + tail: walks with revisits (a-b-a-b) must count
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    got = {
        (f"{r.ent_a}|{r.type_a}", f"{r.ent_b}|{r.type_b}"):
            (r.n1, r.n2, r.n3, r.katz_ppm)
        for r in er.katz_index(_edges(spark, pairs), max_degree=16).collect()
    }
    assert got == _katz_py(pairs, 16)
    # revisit semantics: a-b direct edge also has a->c->a? no — n2 of
    # (a, b) counts a-m-b walks; the a-c-b walk makes n2 >= 1 here
    assert got[("a|E", "b|E")][1] >= 1


def test_katz_relay_cap_excludes_hub(spark):
    # star: hub h relays every leaf pair; cap 1 excludes it -> leaves
    # keep their direct walks to h but no 2-walks through h survive
    pairs = [("h", "p"), ("h", "q"), ("h", "s")]
    got = {
        (r.ent_a, r.ent_b): (r.n1, r.n2, r.n3)
        for r in er.katz_index(_edges(spark, pairs), max_degree=1).collect()
    }
    assert ("p", "q") not in got  # would need the capped hub as relay
    # leaf->hub direct edges survive; leaves (deg 1) still relay h-p-h
    assert got[("h", "p")][0] == 1


def _sents(spark, rows):
    return spark.createDataFrame(
        [(u, i, s) for u, i, s in rows], "url string, sent_idx long, sent string"
    )


def test_acronym_valid_and_trimmed(spark):
    rows = [
        ("1", 0, "Xx yy World Health Organization (WHO) said ."),
        ("1", 1, "The Central Processing Unit (CPU) runs ."),
        ("2", 0, "World Health Organization (WHO) again ."),
    ]
    got = {
        (r.acro, r.long_norm): (r.n_sents, r.n_docs)
        for r in acronym_pairs(_sents(spark, rows)).collect()
    }
    # leading TitleCase noise is trimmed to the matched initialism words
    assert got == {
        ("WHO", "world health organization"): (2, 2),
        ("CPU", "central processing unit"): (1, 1),
    }


def test_acronym_mismatch_and_short_lf_killed(spark):
    rows = [
        # initials GHI != WHO -> killed
        ("1", 0, "Global Health Initiative (WHO) said ."),
        # fewer LF words than acronym letters -> killed
        ("1", 1, "Big Model (LLM) shipped ."),
        # lowercase run before parens -> pattern does not match
        ("1", 2, "the world health organization (WHO) said ."),
    ]
    assert acronym_pairs(_sents(spark, rows)).count() == 0
