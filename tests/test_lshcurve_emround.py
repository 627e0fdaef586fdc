"""LSH operating curve (dedup.lsh_operating_curve) and the FS EM round
(er.fs_em_round) tests."""

from unsupervised_ner_spark.ops.dedup import lsh_operating_curve
from unsupervised_ner_spark.pipeline.er import fs_em_round


def test_lsh_curve_monotone_candidates(spark):
    # identical pair + an unrelated doc; looser banding (1 row/band)
    # can only produce MORE candidates than stricter banding
    docs = spark.createDataFrame(
        [(1, "aa bb cc dd ee ff"), (2, "aa bb cc dd ee ff"),
         (3, "qq rr ss tt uu vv")],
        "doc_id long, text string",
    )
    truth = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    rows = {
        r.band_size: r
        for r in lsh_operating_curve(docs, truth, 3, max_bucket=100)
        .collect()
    }
    assert set(rows) == {1, 2, 4}
    assert rows[1].n_cand >= rows[2].n_cand >= rows[4].n_cand
    # the byte-identical pair collides under EVERY config
    for r in rows.values():
        assert r.n_hit == 1 and r.pc_ppm == 1_000_000
        assert r.n_truth == 1


def _pairs(spark, rows):
    return spark.createDataFrame(
        rows,
        "lev long, tok_overlap long, sh_jaccard_ppm long, len_a long,"
        " len_b long, surf_a string, surf_b string",
    )


def test_fs_em_round_relabels_and_abstains(spark):
    full_match = (0, 1, 900000, 5, 5, "abc", "abc")       # m=1, 1111
    full_nonmatch = (3, 1, 900000, 5, 5, "abq", "abz")    # m=0, 1111
    none_nonmatch = (4, 0, 0, 3, 9, "xy", "qq")           # m=0, 0000
    rows = [full_match] * 4 + [none_nonmatch] * 3
    out = {r.feature: r for r in
           fs_em_round(_pairs(spark, rows), ratio=2).collect()}
    # pattern 1111 -> link (em m=1) for ALL its pairs; 0000 -> nonlink
    tok = out["tok_overlap"]
    assert (tok.n_match, tok.n_nonmatch, tok.n_labeled) == (4, 3, 7)
    assert tok.n_match_agree == 4 and tok.n_nonmatch_agree == 0

    # a 1:1 pattern is 'possible' at ratio 2 -> abstains from the M-step
    rows2 = [full_match, full_nonmatch] + [none_nonmatch] * 3
    out2 = {r.feature: r for r in
            fs_em_round(_pairs(spark, rows2), ratio=2).collect()}
    assert out2["tok_overlap"].n_labeled == 3  # only the 0000 pairs
    assert out2["tok_overlap"].n_match == 0


def test_fs_em_round_flips_seed_labels(spark):
    # the seed rule calls full_nonmatch a non-match (lev=3), but in a
    # pattern dominated by matches the EM round relabels it m=1 — the
    # re-estimation visibly moves mass the seed got wrong
    full_match = (0, 1, 900000, 5, 5, "abc", "abc")
    full_nonmatch = (3, 1, 900000, 5, 5, "abq", "abz")
    rows = [full_match] * 4 + [full_nonmatch]
    out = {r.feature: r for r in
           fs_em_round(_pairs(spark, rows), ratio=2).collect()}
    assert out["tok_overlap"].n_match == 5  # all five, seed said 4
    assert out["tok_overlap"].n_nonmatch == 0
