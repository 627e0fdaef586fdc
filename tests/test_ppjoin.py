"""PPJoin (ops/dedup.ppjoin_pairs) completeness + exactness vs the
brute-force all-pairs Jaccard join — the prefix filter must lose NOTHING
at the threshold (the guarantee the df-capped channel trades away)."""

from __future__ import annotations

import hashlib
import random


from unsupervised_ner_spark.ops.dedup import ppjoin_pairs


def _shingle_set(text, k=3):
    toks = [t.lower() for t in text.split()]
    if len(toks) >= k:
        grams = {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}
    else:
        grams = {" ".join(toks)}
    return {hashlib.md5(g.encode()).hexdigest() for g in grams}


def _brute(texts, tau_ppm):
    sets = {i: _shingle_set(t) for i, t in texts.items()}
    out = {}
    ids = sorted(sets)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if inter * 1_000_000 >= tau_ppm * union:
                out[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    return out


def test_ppjoin_complete_vs_bruteforce(spark):
    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(30)]
    texts = {}
    base = " ".join(rng.choices(vocab, k=20))
    for i in range(14):
        if i % 3 == 0:
            # near-duplicate family: small suffix mutations of base
            texts[i] = base + " " + " ".join(rng.choices(vocab, k=i % 5))
        else:
            texts[i] = " ".join(rng.choices(vocab, k=rng.randint(5, 25)))
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    for tau in (400_000, 500_000, 700_000):
        got = {
            (r["doc_a"], r["doc_b"]): (r["n_common"], r["n_a"], r["n_b"])
            for r in ppjoin_pairs(df, tau_ppm=tau).collect()
        }
        want = _brute(texts, tau)
        assert got == want, f"tau={tau}"
        assert want, f"tau={tau} produced no pairs — weak fixture"
