"""TextRank integer recurrence vs a pure-Python replication, and
Fellegi-Sunter sufficient statistics vs hand counts."""

from __future__ import annotations

from collections import Counter

from unsupervised_ner_spark.ops.textstats import textrank_keywords
from unsupervised_ner_spark.pipeline.er import fs_weights


def _python_textrank(texts, window, min_pair, iterations, scale, topk):
    pairs = Counter()
    for t in texts:
        toks = t.lower().split()
        for i, w1 in enumerate(toks):
            for off in range(1, window + 1):
                if i + off < len(toks):
                    pairs[(w1, toks[i + off])] += 1
    pairs = {p: c for p, c in pairs.items() if c >= min_pair}
    und = Counter()
    for (a, b), c in pairs.items():
        if a != b:  # self-loops excluded (engine rule)
            und[tuple(sorted((a, b)))] += c
    adj = {}
    for (a, b), w in und.items():
        adj.setdefault(a, {})[b] = adj.setdefault(a, {}).get(b, 0) + w
        adj.setdefault(b, {})[a] = adj.setdefault(b, {}).get(a, 0) + w
    strength = {k: sum(v.values()) for k, v in adj.items()}
    tele = 15 * scale // 100
    rank = {k: scale for k in adj}
    for _ in range(iterations):
        inc = {k: 0 for k in adj}
        for src, nbrs in adj.items():
            for dst, w in nbrs.items():
                inc[dst] += (rank[src] * w) // strength[src]
        rank = {k: tele + (85 * inc[k]) // 100 for k in adj}
    ordered = sorted(rank, key=lambda k: (-rank[k], k))[:topk]
    return {
        w: (strength[w], rank[w], i + 1) for i, w in enumerate(ordered)
    }


def test_textrank_matches_python(spark):
    texts = [
        "spark shuffles data across the cluster for wide joins",
        "wide joins shuffle data but broadcast joins avoid the shuffle",
        "the cluster runs spark and spark runs queries across data",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        r["word"]: (r["strength"], r["rank_scaled"], r["rnk"])
        for r in textrank_keywords(
            df, window=2, min_pair=1, iterations=3, topk=8
        ).collect()
    }
    want = _python_textrank(
        texts, window=2, min_pair=1, iterations=3,
        scale=1_000_000_000, topk=8,
    )
    assert got == want


def test_fs_weights_hand_counts(spark):
    rows = [
        # (surf_a, surf_b, lev, len_a, len_b, tok_overlap, jppm)
        ("alpha co", "alphe co", 1, 8, 8, 1, 600_000),   # match, all agree
        ("alpha co", "bravo co", 4, 8, 8, 1, 100_000),   # nonmatch
        ("gamma", "gamma inc", 4, 5, 9, 1, 500_000),     # nonmatch
        ("delta", "delte", 1, 5, 5, 0, 400_000),         # match
    ]
    df = spark.createDataFrame(
        [
            ("k", a, b, lev, la, lb, 1, 1, tov, 1, 2, j)
            for a, b, lev, la, lb, tov, j in rows
        ],
        "pkey string, surf_a string, surf_b string, lev long,"
        " len_a long, len_b long, n_tok_a long, n_tok_b long,"
        " tok_overlap long, sh_inter long, sh_union long,"
        " sh_jaccard_ppm long",
    )
    got = {
        r["feature"]: (
            r["n_match"], r["n_match_agree"],
            r["n_nonmatch"], r["n_nonmatch_agree"],
        )
        for r in fs_weights(df).collect()
    }
    # matches: rows 0 and 3; nonmatches: rows 1 and 2
    assert got == {
        # row0 tok=1 agree; row3 tok=0 | row1 agree, row2 agree
        "tok_overlap": (2, 1, 2, 2),
        # jaccard >= 500000: row0 yes, row3 no | row1 no, row2 yes
        "shingle_jaccard": (2, 1, 2, 1),
        # |len diff| <= 1: row0 yes, row3 yes | row1 yes, row2 no
        "len_diff_le1": (2, 2, 2, 1),
        # prefix2: "al"/"al" yes, "de"/"de" yes | "al"/"br" no,
        # "ga"/"ga" yes
        "prefix2_eq": (2, 2, 2, 1),
    }
