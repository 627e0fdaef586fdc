"""Unit tests for sorted-neighborhood ER blocking
(pipeline/er.py sorted_neighborhood_pairs); the corpus-scale parity gate
is er_sorted_neighborhood."""

from __future__ import annotations

from unsupervised_ner_spark.pipeline import er


def _occ(spark, surfaces):
    return spark.createDataFrame(
        [(s,) for s in surfaces], "norm_surface string"
    )


def _py_lev(a, b):
    # classic Wagner-Fischer, matching F.levenshtein / DuckDB levenshtein
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


def _expected(surfaces, window=3, max_lev=2):
    vocab = sorted(set(s for s in surfaces if s))
    out = set()
    for i, sa in enumerate(vocab):
        for g in range(1, window + 1):
            if i + g < len(vocab):
                sb = vocab[i + g]
                lv = _py_lev(sa, sb)
                if lv <= max_lev:
                    out.add((sa, sb, g, lv))
    return out


def test_sorted_neighborhood_matches_global_order(spark):
    # vocabulary spanning several first-character bands, including a
    # cross-band adjacency (azz -> baz: different bands, gap 1) — the
    # banded two-level rank must equal the global lexicographic rank
    surfaces = ["apple", "apples", "azz", "baz", "bazaar", "corn", "core",
                "cord", "zebra"]
    got = {
        (r.surf_a, r.surf_b, r.gap, r.lev)
        for r in er.sorted_neighborhood_pairs(_occ(spark, surfaces)).collect()
    }
    exp = _expected(surfaces)
    assert got == exp
    # the cross-band pair survived and gaps beyond 1 exist
    assert ("azz", "baz", 1, 2) in got
    assert any(g > 1 for (_, _, g, _) in got)


def test_sorted_neighborhood_window_and_verify_cut(spark):
    # "aa" and "ab" are adjacent (kept, lev 1); "aa" vs "zzzz" adjacent
    # in a 2-word vocab but lev 4 > 2 (verify drops it)
    got = er.sorted_neighborhood_pairs(_occ(spark, ["aa", "zzzz"])).collect()
    assert got == []
    got2 = {
        (r.surf_a, r.surf_b)
        for r in er.sorted_neighborhood_pairs(_occ(spark, ["aa", "ab"])).collect()
    }
    assert got2 == {("aa", "ab")}


def test_sorted_neighborhood_dedups_input(spark):
    # duplicate occurrences collapse to the distinct vocabulary first
    got = er.sorted_neighborhood_pairs(
        _occ(spark, ["aa", "aa", "ab", "ab"])
    ).collect()
    assert len(got) == 1 and got[0].gap == 1
