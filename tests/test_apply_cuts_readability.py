"""Exact-substring cut application (dedup.apply_substring_cuts) and
Flesch-Kincaid readability (textstats.readability) branch tests."""

import hashlib

from unsupervised_ner_spark.ops.dedup import apply_substring_cuts
from unsupervised_ner_spark.ops.textstats import readability


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def test_apply_cuts_keeps_first_cuts_later(spark):
    shared = "r1 r2 r3 r4 r5 r6 r7"
    docs = _docs(
        spark,
        [
            "x1 x2 " + shared + " x3",       # doc 0: first copy, kept whole
            "y1 " + shared + " y2",          # doc 1: later copy, run cut
        ],
    )
    rows = apply_substring_cuts(docs, k=4, min_len=6).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.doc_id == 1
    assert (r.n_tokens, r.n_cut_tokens, r.n_tokens_after) == (9, 7, 2)
    assert r.kept_md5 == _md5("y1 y2")


def test_apply_cuts_merges_overlapping_intervals(spark):
    # doc 2 shares [pos 1..7] with doc 0 and [pos 4..10] with doc 1 -> the
    # two cut intervals overlap and must merge to one [1..10] cut.
    a = "s1 s2 s3 s4 s5 s6 s7"
    b = "s4 s5 s6 s7 s8 s9 s10"
    docs = _docs(
        spark,
        [
            a + " xa xb xc xd",
            "yb yc yd " + b,
            "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 tail1 tail2",
        ],
    )
    rows = {r.doc_id: r for r in apply_substring_cuts(docs, k=4, min_len=6).collect()}
    r2 = rows[2]
    assert (r2.n_tokens, r2.n_cut_tokens, r2.n_tokens_after) == (12, 10, 2)
    assert r2.kept_md5 == _md5("tail1 tail2")


def test_apply_cuts_fully_covered_doc(spark):
    shared = "c1 c2 c3 c4 c5 c6"
    docs = _docs(spark, [shared + " extra", shared])
    rows = apply_substring_cuts(docs, k=4, min_len=6).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_id, r.n_tokens_after) == (1, 0)
    assert r.kept_md5 == _md5("")


def test_readability_exact_counts(spark):
    # "the cat sat." -> 3 words, 1 terminal-punct sentence token,
    # syllables: the=1 cat=1 sat.=1 -> 3; fk = 3900*3//1 + 118000*3//3 - 1559
    docs = _docs(spark, ["the cat sat.", "xyzzy"])
    rows = {r.doc_id: r for r in readability(docs).collect()}
    r0 = rows[0]
    assert (r0.n_words, r0.n_sents, r0.n_syllables) == (3, 1, 3)
    assert r0.fk_x100 == 3900 * 3 // 1 + 118000 * 3 // 3 - 1559
    # 'xyzzy': y counts as a vowel group twice -> 2 syllables, clamped
    # sentence count 1
    r1 = rows[1]
    assert (r1.n_words, r1.n_sents, r1.n_syllables) == (1, 1, 2)


def test_readability_syllable_clamp(spark):
    # a no-vowel token clamps to 1 syllable, not 0
    rows = readability(_docs(spark, ["tsk tsk"])).collect()
    assert rows[0].n_syllables == 2
