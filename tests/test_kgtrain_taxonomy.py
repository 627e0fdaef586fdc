"""Unit tests for Hearst taxonomy induction (pipeline/taxonomy.py) and
the KG-embedding training-data ops (ops/kgtrain.py)."""

from pyspark.sql import functions as F

from unsupervised_ner_spark.ops.kgtrain import (
    entity_contexts,
    entity_index,
    negative_samples,
)
from unsupervised_ner_spark.pipeline.taxonomy import hearst_hypernyms


def _sents(spark, rows):
    return spark.createDataFrame(rows, "url string, sent_idx long, sent string")


def test_hearst_both_patterns_and_normalization(spark):
    s = _sents(
        spark,
        [
            ("u1", 0, "Imatinib is a drug ."),
            ("u1", 1, "drugs such as Gleevec are common ."),
            ("u2", 0, "Imatinib is a drug and more ."),
            ("u2", 1, "Asbestos is an element ."),
            ("u2", 2, "nothing to see here ."),
        ],
    )
    rows = {(r.hypo, r.hyper, r.pattern): (r.n_sents, r.n_docs)
            for r in hearst_hypernyms(s).collect()}
    # hyponym lowercased; 'is a' found in two docs; 'is an' branch matches
    assert rows[("imatinib", "drug", "isa")] == (2, 2)
    assert rows[("gleevec", "drug", "such_as")] == (1, 1)
    assert rows[("asbestos", "element", "isa")] == (1, 1)
    assert len(rows) == 3


def test_hearst_first_match_only(spark):
    # two is-a occurrences in one sentence: regexp_extract takes the first
    s = _sents(spark, [("u1", 0, "Foo is a thing and Bar is a gadget .")])
    rows = [(r.hypo, r.hyper) for r in hearst_hypernyms(s).collect()]
    assert rows == [("foo", "thing")]


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "url string, subj string, subj_type string, pred_norm string, "
        "obj string, obj_type string"
    )


def test_entity_index_is_dense_permutation(spark):
    t = _triples(
        spark,
        [("u", f"e{i}", "T", "p", f"e{(i + 1) % 9}", "T") for i in range(9)],
    )
    idx = entity_index(t).collect()
    assert sorted(r.ent_idx for r in idx) == list(range(9))
    assert len({r.ent for r in idx}) == 9
    # order contract: ent_idx follows (md5(ent), ent)
    import hashlib

    want = sorted(
        {r.ent for r in idx},
        key=lambda s: (hashlib.md5(s.encode()).hexdigest(), s),
    )
    got = [r.ent for r in sorted(idx, key=lambda r: r.ent_idx)]
    assert got == want


def test_negative_samples_deterministic_and_in_vocab(spark):
    t = _triples(
        spark,
        [
            ("u1", "a", "T1", "causes", "b", "T2"),
            ("u2", "a", "T1", "causes", "b", "T2"),  # dup collapses
            ("u1", "b", "T2", "treats", "c", "T3"),
        ],
    )
    out = negative_samples(t, k=3).collect()
    # 2 distinct triples x 3 negatives
    assert len(out) == 6
    vocab = {"a", "b", "c"}
    for r in out:
        assert r.neg_obj in vocab
        assert r.hits_true == (1 if r.neg_obj == r.obj else 0)
    again = negative_samples(t, k=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_entity_contexts_window_and_mask(spark):
    sents = _sents(spark, [("u1", 0, "a b c d TargetSpan:__entity__ f g h i j .")])
    typed = spark.createDataFrame(
        [("u1", 0, 0, 4, 4, "TargetSpan", "THING")],
        "url string, sent_idx long, mention_idx long, begin_tok long, "
        "end_tok long, surface string, pred_group string",
    )
    [r] = entity_contexts(typed, sents, window=3).collect()
    assert r.left_ctx == "b c d"
    assert r.right_ctx == "f g h"  # marker stripped, window clipped at 3
    assert r.masked == "b c d [MASK] f g h"
    assert r.etype == "THING"


def test_entity_contexts_clips_at_sentence_edges(spark):
    sents = _sents(spark, [("u1", 0, "Edge b c")])
    typed = spark.createDataFrame(
        [("u1", 0, 0, 0, 0, "Edge", "T"), ("u1", 0, 1, 2, 2, "c", "T")],
        "url string, sent_idx long, mention_idx long, begin_tok long, "
        "end_tok long, surface string, pred_group string",
    )
    rows = {r.mention_idx: r for r in entity_contexts(typed, sents, window=3).collect()}
    assert rows[0].left_ctx == "" and rows[0].right_ctx == "b c"
    assert rows[0].masked == "[MASK] b c"
    assert rows[1].left_ctx == "Edge b" and rows[1].right_ctx == ""
    assert rows[1].masked == "Edge b [MASK]"


def test_negative_samples_matches_flat_rank_oracle(spark):
    """Engine two-level vocab rank == flat (md5(ent), ent) row_number —
    the exact contract the DuckDB twin relies on."""
    import hashlib

    t = _triples(
        spark,
        [("u", f"s{i}", "A", f"p{i % 3}", f"o{i % 5}", "B") for i in range(20)],
    )
    vocab = sorted(
        {f"s{i}" for i in range(20)} | {f"o{i % 5}" for i in range(20)},
        key=lambda s: (hashlib.md5(s.encode()).hexdigest(), s),
    )
    for r in negative_samples(t, k=2).collect():
        key = f"{r.subj}|{r.pred_norm}|{r.obj}|{r.neg_k}"
        pick = int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % len(vocab)
        assert r.neg_obj == vocab[pick]


def test_taxonomy_closure_2hop(spark):
    from unsupervised_ner_spark.pipeline.taxonomy import taxonomy_closure_2hop

    edges = spark.createDataFrame(
        [
            # (imatinib -> drug) split across the two patterns: collapses to n=3
            ("imatinib", "drug", "isa", 2, 1),
            ("imatinib", "drug", "such_as", 1, 1),
            ("drug", "substance", "isa", 5, 2),
            ("substance", "imatinib", "isa", 1, 1),  # would make a loop at 2 hops
        ],
        "hypo string, hyper string, pattern string, n_sents long, n_docs long",
    )
    rows = {(r.hypo, r.mid, r.hyper): r.support
            for r in taxonomy_closure_2hop(edges).collect()}
    # imatinib -> drug -> substance with least(3, 5) = 3
    assert rows[("imatinib", "drug", "substance")] == 3
    # drug -> substance -> imatinib with least(5, 1) = 1
    assert rows[("drug", "substance", "imatinib")] == 1
    # substance -> imatinib -> drug with least(1, 3) = 1
    assert rows[("substance", "imatinib", "drug")] == 1
    # the hypo == hyper loop (imatinib -> drug -> ... never returns to
    # imatinib in 2 hops here, but substance -> imatinib -> substance
    # style loops are filtered): no (x, _, x) rows at all
    assert not [k for k in rows if k[0] == k[2]]


def test_lsh_bucket_stats_histogram_and_cap(spark):
    from unsupervised_ner_spark.ops.dedup import lsh_bucket_stats

    same = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(1, same), (2, same), (3, same), (4, "totally different words here now")],
        "doc_id long, text string",
    )
    out = lsh_bucket_stats(docs, max_bucket=2).collect()
    # every band: one bucket of size 3 (the identical docs) + one singleton
    by_band = {}
    for r in out:
        by_band.setdefault(r.band_id, {})[r.bucket_size] = (r.n_buckets, r.over_cap)
    for band, hist in by_band.items():
        assert hist[3] == (1, 1), f"band {band}: {hist}"  # over the cap of 2
        assert hist[1] == (1, 0), f"band {band}: {hist}"
