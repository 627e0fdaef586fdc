"""Constellation audio fingerprint + offset-consistent matching tests
(multimodal.audio_fingerprints / audio_match_pairs)."""

from unsupervised_ner_spark.ops.multimodal import (
    audio_fingerprints,
    audio_match_pairs,
)


def _payload(n=320, seed=0):
    return bytes((i * 37 + 11 * (seed + 1)) % 251 for i in range(n))


def _media(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(rows)],
        "doc_id long, payload binary",
    )


def test_identical_payloads_match_at_offset_zero(spark):
    p = _payload()
    out = audio_match_pairs(
        audio_fingerprints(_media(spark, [p, p, _payload(seed=5)]))
    ).collect()
    got = {(r.doc_a, r.doc_b): r for r in out}
    assert (0, 1) in got
    m = got[(0, 1)]
    assert m.offset == 0
    assert m.n_aligned >= 8
    # the unrelated doc must not match anyone
    assert all({a, b} == {0, 1} for a, b in got)


def test_shifted_copy_matches_at_frame_offset(spark):
    p = _payload()
    shifted = b"z" * 64 + p  # exactly two 32-byte frames of lead-in
    out = audio_match_pairs(
        audio_fingerprints(_media(spark, [p, shifted]))
    ).collect()
    got = {(r.doc_a, r.doc_b): r for r in out}
    m = got[(0, 1)]
    # doc 1's copy of p starts two frames later: t_a - t_b = -2
    assert m.offset == -2
    assert m.n_aligned >= 8
    assert m.n_shared >= m.n_aligned


def test_df_cap_drops_ubiquitous_hashes(spark):
    # four identical docs with an explicit cap of 3: every hash lives in
    # 4 > 3 docs -> all stop-hashes -> no matches at all
    p = _payload()
    fp = audio_fingerprints(_media(spark, [p, p, p, p]))
    assert audio_match_pairs(fp, df_cap=3).count() == 0
    # raising the cap restores all six pairs
    assert audio_match_pairs(fp, df_cap=10).count() == 6


def test_fingerprints_are_deterministic_integers(spark):
    fp = audio_fingerprints(_media(spark, [_payload()])).collect()
    assert fp
    n_bands, max_dt = 32, 3
    for r in fp:
        assert 0 <= r.fp_hash < (n_bands * n_bands) * (max_dt + 1)
        dt = r.fp_hash % (max_dt + 1)
        assert 1 <= dt <= max_dt
