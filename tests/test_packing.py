"""Sequence packing (ops/packing.py) and incremental-ingest dedup
(ops/dedup.py incremental_dedup): exactness of the distributed prefix sum
and of the admit/dup decision tables."""

import hashlib

import pytest
from pyspark.sql import functions as F

from unsupervised_ner_spark.ops import dedup
from unsupervised_ner_spark.ops.packing import pack_sequences, pack_stats


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for i in range(120):
        n = (i * 7) % 23 + 1  # 1..23 tokens, varied
        rows.append((i, " ".join(f"w{i}t{j}" for j in range(n))))
    rows.append((900, ""))  # empty doc: must be dropped
    rows.append((901, "   "))  # whitespace-only: also zero tokens
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def _expected_order(ids):
    return sorted(ids, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))


def test_pack_offsets_are_exact_prefix_sums(docs):
    out = {r.doc_id: r for r in pack_sequences(docs, seq_len=64).collect()}
    assert 900 not in out and 901 not in out, "zero-token docs must drop"
    order = _expected_order(out)
    running = 0
    for d in order:
        r = out[d]
        assert r.tok_offset == running, f"doc {d}: offset {r.tok_offset} != {running}"
        running += r.n_tok
    assert running == sum(r.n_tok for r in out.values())


def test_pack_bucket_granularity_invariance(docs):
    """The two-level prefix sum must give THE SAME offsets at any bucket
    width — bucketing is an execution detail, not a semantic one."""
    a = sorted(pack_sequences(docs, 64, bucket_hex=1).collect())
    b = sorted(pack_sequences(docs, 64, bucket_hex=2).collect())
    c = sorted(pack_sequences(docs, 64, bucket_hex=3).collect())
    assert a == b == c


def test_pack_boundaries_match_bruteforce(docs):
    seq_len = 16
    out = {r.doc_id: r for r in pack_sequences(docs, seq_len).collect()}
    for d, r in out.items():
        assert r.pack_first == r.tok_offset // seq_len
        assert r.pack_last == (r.tok_offset + r.n_tok - 1) // seq_len
        assert r.n_packs == r.pack_last - r.pack_first + 1
    assert any(r.n_packs > 1 for r in out.values()), "fixture must straddle cuts"


def test_pack_stats_totals(docs):
    packed = pack_sequences(docs, 16)
    s = pack_stats(packed, 16).collect()[0]
    rows = packed.collect()
    assert s.n_docs == len(rows)
    assert s.n_tokens == sum(r.n_tok for r in rows)
    assert s.n_seqs == (s.n_tokens + 15) // 16
    assert s.n_straddlers == sum(1 for r in rows if r.n_packs > 1)


def test_pack_validation(docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, 0)
    with pytest.raises(ValueError):
        pack_sequences(docs, 16, bucket_hex=0)


def test_incremental_dedup_decisions(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different text about geology and rocks and minerals here")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, base),  # near-dup of corpus doc 1
            (11, "fresh unrelated content regarding maritime navigation and tides today"),
            (12, "fresh unrelated content regarding maritime navigation and tides today"),  # dup of 11 within batch
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.incremental_dedup(corpus, batch).collect()}
    assert set(out) == {10, 11, 12}, "one row per batch doc"
    assert out[10].dup_of_corpus and out[10].corpus_rep == 1 and not out[10].admit
    assert out[11].admit and not out[11].dup_of_corpus and not out[11].dup_in_batch
    assert out[12].dup_in_batch and out[12].batch_rep == 11 and not out[12].admit


def test_incremental_dedup_greedy_precedence(spark):
    """Within-batch dedup is greedy by doc_id: the SMALLEST id in a dup
    group admits, every other member points at an earlier one."""
    text = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [(1, "unrelated corpus filler about astronomy telescopes and distant galaxies")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(20, text), (21, text), (22, text)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in dedup.incremental_dedup(corpus, batch).collect()}
    assert out[20].admit and not out[20].dup_in_batch
    assert out[21].batch_rep == 20 and not out[21].admit
    assert out[22].batch_rep == 20 and not out[22].admit


def test_chunk_tokens_coverage_and_overlap(spark):
    from unsupervised_ner_spark.ops.packing import chunk_tokens

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{j}" for j in range(100))),  # multi-chunk
            (2, "a b c"),  # single short chunk
            (3, " ".join(f"u{j}" for j in range(64))),  # exactly chunk_len
            (4, ""),  # dropped
        ],
        "doc_id long, text string",
    )
    out = chunk_tokens(docs, chunk_len=64, stride=48).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 4 not in by_doc
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == "a b c"
    assert len(by_doc[3]) == 1 and by_doc[3][0].n_tok_chunk == 64
    # doc 1 (100 toks): starts 0, 48 -> covers [0,64) and [48,100)
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [(r.start_tok, r.n_tok_chunk) for r in c1] == [(0, 64), (48, 52)]
    assert c1[0].chunk_text.split()[:2] == ["t0", "t1"]
    assert c1[1].chunk_text.split()[-1] == "t99"
    # tail coverage: every token index is inside some chunk
    covered = set()
    for r in c1:
        covered |= set(range(r.start_tok, r.start_tok + r.n_tok_chunk))
    assert covered == set(range(100))
    import pytest as _pt

    with _pt.raises(ValueError):
        chunk_tokens(docs, chunk_len=8, stride=9)


def test_pack_manifest_partitions_docs_exactly(docs):
    from unsupervised_ner_spark.ops.packing import pack_manifest, pack_sequences

    seq_len = 16
    packed = pack_sequences(docs, seq_len)
    man = pack_manifest(packed, seq_len).collect()
    by_doc = {}
    for r in man:
        by_doc.setdefault(r.doc_id, []).append(r)
    for r in packed.collect():
        slices = sorted(by_doc[r.doc_id], key=lambda m: m.pack_id)
        # the doc's slices tile [0, n_tok) without gap or overlap
        assert sum(m.n_tok_in_pack for m in slices) == r.n_tok
        assert slices[0].start_tok == 0
        for prev, cur in zip(slices, slices[1:]):
            assert prev.start_tok + prev.n_tok_in_pack == cur.start_tok
            assert cur.pack_id == prev.pack_id + 1
            assert cur.pos_in_pack == 0  # continuation slices start the pack
        # in-pack positions stay inside the pack
        for m in slices:
            assert 0 <= m.pos_in_pack < seq_len
            assert m.pos_in_pack + m.n_tok_in_pack <= seq_len


def test_bigram_novelty_counts(spark):
    from unsupervised_ner_spark.ops.textstats import bigram_novelty

    docs = spark.createDataFrame(
        [
            (1, "x y z"),          # bigrams: (x,y), (y,z)
            (2, "x y w"),          # bigrams: (x,y), (y,w)
            (3, "solo"),           # no bigram -> absent from output
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_novelty(docs).collect()}
    assert set(out) == {1, 2}
    # (x,y) occurs twice in the corpus -> not rare; (y,z)/(y,w) once -> rare
    assert out[1].n_bigrams == 2 and out[1].n_rare_bigrams == 1
    assert out[2].n_bigrams == 2 and out[2].n_rare_bigrams == 1
