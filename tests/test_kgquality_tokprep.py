"""Unit tests for the KG-quality and tokenizer-prep batch: appositive
typing, predicate functionality / conflicting-fact detection, BPE pair
statistics, and feature hashing."""

import hashlib

from pyspark.sql import functions as F


def test_appositive_pattern_first_match_and_normalization(spark):
    from unsupervised_ner_spark.pipeline.taxonomy import appositive_types

    sents = spark.createDataFrame(
        [
            # basic match, instance lowercased on output
            ("u1", 0, "Tamoxifen, a medicine, was mentioned"),
            # 'an' article + multi-word entity
            ("u1", 1, "New York, an automaker, is odd but matches"),
            # first match only: second appositive in the sentence ignored
            ("u2", 0, "Berlin, a city, and Toyota, a automaker, appear"),
            # no trailing comma after the class -> no match
            ("u2", 1, "Berlin, a city that never sleeps"),
            # lowercase head -> entity side requires capitalized run
            ("u3", 0, "tamoxifen, a medicine, was mentioned"),
        ],
        "url string, sent_idx long, sent string",
    )
    rows = {(r.inst, r.cls): (r.n_sents, r.n_docs) for r in appositive_types(sents).collect()}
    assert rows == {
        ("tamoxifen", "medicine"): (1, 1),
        ("new york", "automaker"): (1, 1),
        ("berlin", "city"): (1, 1),
    }


def test_predicate_functionality_flag_is_integer_rule(spark):
    from unsupervised_ner_spark.pipeline.triples import predicate_functionality

    # capital_of: 4/5 subjects single-valued -> functional at 4/5 exactly
    # related_to: 1/2 single-valued -> not functional
    rows = []
    for i in range(4):
        rows.append((f"s{i}", "capital_of", f"o{i}"))
    rows += [("s4", "capital_of", "x"), ("s4", "capital_of", "y")]
    rows += [("a", "related_to", "p"), ("b", "related_to", "q"),
             ("b", "related_to", "r")]
    t = spark.createDataFrame(rows, "subj string, pred_norm string, obj string")
    out = {r.pred_norm: r for r in predicate_functionality(t).collect()}
    cap = out["capital_of"]
    assert (cap.n_subjects, cap.n_single, cap.max_objs, cap.is_functional) == (5, 4, 2, 1)
    rel = out["related_to"]
    assert (rel.n_subjects, rel.n_single, rel.max_objs, rel.is_functional) == (2, 1, 2, 0)


def test_functional_conflicts_lists_sorted_objects(spark):
    from unsupervised_ner_spark.pipeline.triples import functional_conflicts

    rows = []
    for i in range(4):
        rows.append((f"s{i}", "capital_of", f"o{i}"))
    # duplicate observation of the same object is NOT a conflict
    rows.append(("s0", "capital_of", "o0"))
    rows += [("s4", "capital_of", "zz"), ("s4", "capital_of", "aa")]
    rows += [("a", "related_to", "p"), ("a", "related_to", "q")]
    t = spark.createDataFrame(rows, "subj string, pred_norm string, obj string")
    out = functional_conflicts(t).collect()
    # related_to is not functional (0/1 single) -> its multi-object subject
    # is not a conflict; only the capital_of violation surfaces
    assert len(out) == 1
    r = out[0]
    assert (r.pred_norm, r.subj, r.n_objs, r.objs, r.n_subjects) == (
        "capital_of", "s4", 2, "aa|zz", 5,
    )


def test_bpe_pair_stats_multiplicity_weighting_and_guards(spark):
    from unsupervised_ner_spark.ops.textstats import bpe_pair_stats

    docs = spark.createDataFrame(
        [
            (1, "aaa ab"),          # "aaa": (a,a) twice per occurrence
            (2, "aaa Ab x " + "q" * 40),  # lowercased; 1-char + >30-char dropped
        ],
        "doc_id long, text string",
    )
    out = {(r.left_sym, r.right_sym): (r.n_occ, r.n_words)
           for r in bpe_pair_stats(docs).collect()}
    # "aaa" freq 2 -> (a,a): 2 occurrences in-word x freq 2 = 4, 1 word
    # "ab" freq 2 (ab + lowercased Ab) -> (a,b): 2, 1 word
    assert out == {("a", "a"): (4, 1), ("a", "b"): (2, 1)}


def test_hashing_tf_index_and_collision_fold(spark):
    from unsupervised_ner_spark.ops.textstats import hashing_tf

    docs = spark.createDataFrame(
        [(1, "Alpha alpha beta"), (2, "beta")],
        "doc_id long, text string",
    )
    out = {(r.doc_id, r.feature_idx): r.n for r in hashing_tf(docs, dim=1024).collect()}

    def idx(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 1024

    # case folded: Alpha+alpha collide on the same feature
    assert out[(1, idx("alpha"))] == 2
    assert out[(1, idx("beta"))] == 1
    assert out[(2, idx("beta"))] == 1
    assert len(out) == 3


def test_sentence_dedup_keep_first_and_counts(spark):
    from unsupervised_ner_spark.ops.dedup import sentence_dedup

    sents = spark.createDataFrame(
        [
            ("10", 3, "same sentence here"),
            ("2", 7, "same sentence here"),
            ("2", 1, "same sentence here"),   # same doc twice
            ("9", 0, "a unique one"),
        ],
        "url string, sent_idx long, sent string",
    )
    out = sentence_dedup(sents).collect()
    assert len(out) == 1
    r = out[0]
    # keep-first is lexicographic on (url, zero-padded idx): "10|...0003"
    # sorts before "2|..." because '1' < '2' — string order on url, as
    # documented; within a url the padding makes idx order numeric
    assert (r.n_copies, r.n_docs, r.keep_url, r.keep_sent_idx) == (3, 2, "10", 3)


def test_reciprocal_pairs_directions_and_pred_lists(spark):
    from unsupervised_ner_spark.pipeline.er import reciprocal_pairs

    t = spark.createDataFrame(
        [
            ("a", "knows", "b"), ("a", "likes", "b"), ("b", "knows", "a"),
            ("a", "knows", "c"),                       # one-way: excluded
            ("d", "sees", "d"),                        # self-loop: both dirs
        ],
        "subj string, pred_norm string, obj string",
    )
    out = {(r.ent_a, r.ent_b): r for r in reciprocal_pairs(t).collect()}
    assert set(out) == {("a", "b")}
    r = out[("a", "b")]
    assert (r.n_ab, r.preds_ab, r.n_ba, r.preds_ba) == (2, "knows|likes", 1, "knows")


def test_conll_export_orders_tokens(spark):
    from unsupervised_ner_spark.pipeline.tagging import conll_export

    tags = spark.createDataFrame(
        [
            ("u", 0, 1, "Smith", "I_PERSON"),
            ("u", 0, 0, "John", "B_PERSON"),
            ("u", 0, 2, "spoke", "O"),
            ("u", 1, 0, "Hello", "O"),
        ],
        "url string, sent_idx long, token_idx long, word string, tag string",
    )
    out = {(r.url, r.sent_idx): (r.conll, r.n_tokens)
           for r in conll_export(tags).collect()}
    assert out[("u", 0)] == ("John B_PERSON\nSmith I_PERSON\nspoke O", 3)
    assert out[("u", 1)] == ("Hello O", 1)


def test_word_pmi_pairs_and_marginals(spark):
    from unsupervised_ner_spark.ops.textstats import word_pmi_stats

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")],
        "doc_id long, text string",
    )
    out = {(r.w1, r.w2): (r.n_pair, r.n_w1, r.n_w2, r.n_total)
           for r in word_pmi_stats(docs, window=2, min_pair=2).collect()}
    # offsets +1: (a,b)x2 + (b,a)x1 in doc1, (a,b) in doc2
    # offsets +2: (a,a), (b,b) in doc1 only -> below min_pair=2
    assert out[("a", "b")] == (3, 3, 3, 6)
    assert ("b", "a") not in out          # n_pair 1 < min_pair
    assert ("a", "a") not in out


def test_shared_ngram_spans_window_and_provenance(spark):
    from unsupervised_ner_spark.ops.dedup import shared_ngram_spans

    docs = spark.createDataFrame(
        [
            (7, "w x y z tail"),
            (3, "head w x y z"),
            (5, "nothing in common here"),
            (9, "shrt"),                 # < k tokens: no windows
        ],
        "doc_id long, text string",
    )
    out = shared_ngram_spans(docs, k=4).collect()
    assert len(out) == 1
    r = out[0]
    # "w x y z" occurs at pos 1 in doc 7 and pos 2 in doc 3; keep-first
    # is the lpad (doc_id, pos) min -> doc 3
    assert (r.n_occ, r.n_docs, r.keep_doc_id, r.keep_pos) == (2, 2, 3, 2)


def test_tag_transitions_with_boundaries(spark):
    from unsupervised_ner_spark.pipeline.tagging import tag_transitions

    tags = spark.createDataFrame(
        [
            ("u", 0, 0, "B_X"), ("u", 0, 1, "I_X"), ("u", 0, 2, "O"),
            ("u", 1, 0, "O"),
        ],
        "url string, sent_idx long, token_idx long, tag string",
    )
    out = {(r.prev_tag, r.tag): r.n for r in tag_transitions(tags).collect()}
    assert out == {
        ("START", "B_X"): 1, ("B_X", "I_X"): 1, ("I_X", "O"): 1,
        ("O", "END"): 2, ("START", "O"): 1,
    }


def test_bpe_second_iteration_merge_semantics(spark):
    from unsupervised_ner_spark.ops.textstats import bpe_second_iteration

    # vocabulary: "abab" x3, "ab" x2, "aaa" x1 -> iteration-1 argmax is
    # (a,b) with n_occ 3*2 + 2*1 = 8; after the merge: "abab" -> XX
    # (pair (ab,ab)), "ab" -> X (no pair), "aaa" -> "aaa" unchanged
    docs = spark.createDataFrame(
        [(1, "abab abab abab ab ab aaa")], "doc_id long, text string"
    )
    rows = bpe_second_iteration(docs).collect()
    assert all((r.merge_l, r.merge_r) == ("a", "b") for r in rows)
    got = {(r.left_sym, r.right_sym): (r.n_occ, r.n_words) for r in rows}
    assert got == {
        ("ab", "ab"): (3, 1),   # from "abab" (freq 3)
        ("a", "a"): (2, 1),     # from "aaa" (freq 1, two pairs)
    }
