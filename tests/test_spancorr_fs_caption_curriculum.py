"""Span corruption (packing.span_corruption), FS pattern regions
(er.fs_patterns), caption groups (multimodal.caption_groups), and
curriculum ordering (curation.curriculum_order) tests."""

import hashlib

from unsupervised_ner_spark.ops.curation import curriculum_order
from unsupervised_ner_spark.ops.multimodal import caption_groups, synth_media
from unsupervised_ner_spark.ops.packing import span_corruption
from unsupervised_ner_spark.pipeline.er import fs_patterns


def _noisy(doc_id, n_tok, pct=15):
    out = []
    for pos in range(n_tok):
        h = hashlib.md5(f"{doc_id}:{pos}".encode()).hexdigest()
        if int(h[:8], 16) % 100 < pct:
            out.append(pos)
    return out


def test_span_corruption_matches_reference_draw(spark):
    texts = [(i, " ".join(f"w{j}" for j in range(40))) for i in range(6)]
    texts.append((99, ""))  # empty doc: dropped
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = {r.doc_id: r for r in span_corruption(df).collect()}
    assert 99 not in out
    for doc_id in range(6):
        noisy = _noisy(doc_id, 40)
        spans = sum(
            1 for i, p in enumerate(noisy) if i == 0 or p - noisy[i - 1] > 1
        )
        r = out[doc_id]
        assert r.n_tok == 40
        assert r.n_noise == len(noisy)
        assert r.n_spans == spans
        assert r.input_len == 40 - len(noisy) + spans
        assert r.target_len == len(noisy) + spans + 1


def _pairs(spark, rows):
    # (lev, tok_overlap, sh_jaccard_ppm, len_a, len_b, surf_a, surf_b)
    return spark.createDataFrame(
        rows,
        "lev long, tok_overlap long, sh_jaccard_ppm long, len_a long,"
        " len_b long, surf_a string, surf_b string",
    )


def test_fs_patterns_three_regions(spark):
    full_agree_match = (0, 1, 900000, 5, 5, "abc", "abc")      # m=1, 1111
    full_agree_nonmatch = (3, 1, 900000, 5, 5, "abq", "abz")   # m=0, 1111
    no_agree_nonmatch = (4, 0, 0, 3, 9, "xy", "qq")            # m=0, 0000
    rows = (
        [full_agree_match] * 4 + [full_agree_nonmatch] * 1
        + [no_agree_nonmatch] * 3
    )
    out = {r.pattern: r for r in fs_patterns(_pairs(spark, rows), ratio=2).collect()}
    assert out["1111"].region == "link"       # 4:1 >= 2:1
    assert out["0000"].region == "nonlink"    # 0:3
    mixed = [full_agree_match] * 1 + [full_agree_nonmatch] * 1
    out2 = {
        r.pattern: r
        for r in fs_patterns(_pairs(spark, mixed), ratio=2).collect()
    }
    assert out2["1111"].region == "possible"  # 1:1 inside (1/2, 2)
    assert out2["1111"].n_pairs == 2


def test_caption_groups_consolidation(spark):
    docs = spark.createDataFrame(
        [(1, "red cat"), (2, "red cat"), (3, "blue dog")],
        "doc_id long, text string",
    )
    media = synth_media(docs)
    pairs = spark.createDataFrame(
        [(1, "a red cat"), (2, "the red cat"), (2, "the red cat"),
         (3, "a blue dog")],
        "img_id long, caption string",
    )
    out = caption_groups(pairs, media).collect()
    by_n = {r.n_images: r for r in out}
    dup = by_n[2]  # docs 1+2 share the payload -> one pHash group
    assert dup.n_pairs == 3
    assert dup.n_captions == 2
    assert dup.rep_caption == "a red cat"
    single = by_n[1]
    assert (single.n_pairs, single.n_captions) == (1, 1)
    assert len(out) == 2


def test_curriculum_order_stages_and_density(spark):
    good = "the cat sat on the mat and the dog ran off to the park"
    lowlex = " ".join(["the cat"] * 20)      # distinct/total < 40%
    boiler = " ".join(f"tok{i}" for i in range(30))  # no stopwords
    short = "one two"
    docs = spark.createDataFrame(
        [(0, good), (1, boiler), (2, short), (3, good), (4, lowlex)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in curriculum_order(docs).collect()}
    assert {r.quality for r in out.values()} == {
        "good", "boilerplate", "short", "lowlex",
    }
    ranks = sorted(r.curriculum_rank for r in out.values())
    assert ranks == [0, 1, 2, 3, 4]  # dense global rank
    # stage order respected: every good doc ranks before lowlex before
    # boilerplate before short
    by_stage = sorted(out.values(), key=lambda r: r.curriculum_rank)
    stages = [r.stage for r in by_stage]
    assert stages == sorted(stages)
    assert out[2].curriculum_rank == 4  # short is last
