"""Unit tests for span algebra (kernel/spans.py) against reference semantics
(ensemble/utils/common.py:15-113; batched_main_NER.py:327-373)."""

import pytest
from hypothesis import given
from hypothesis import strategies as st

from unsupervised_ner_spark.kernel import spans as S


def test_marker_path_parsing():
    # set_POS_based_on_entities (common.py:66-79): markers -> nounish, strip
    toks = S.parse_tokens("Lou:__entity__ Gehrig:__entity__ works in XCorp:__entity__")
    assert [t.word for t in toks] == ["Lou", "Gehrig", "works", "in", "XCorp"]
    assert [t.nounish for t in toks] == [True, True, False, False, True]


def test_marker_path_disables_poslite():
    # any marker present -> ONLY marked tokens are nounish
    toks = S.parse_tokens("Mesothelioma:__entity__ is caused by asbestos")
    assert [t.nounish for t in toks] == [True, False, False, False, False]


def test_span_runs_and_mentions():
    toks = S.parse_tokens("He felt New York has a chance")
    assert S.span_bitmap(toks) == [0, 0, 1, 1, 0, 0, 1]
    ms = S.detect_mentions(toks)
    assert [(m.begin_tok, m.end_tok, m.surface) for m in ms] == [
        (2, 3, "New York"),
        (6, 6, "chance"),
    ]


def test_masked_sentence():
    # gen_sentence (common.py:34-54): span -> single __entity__ token
    toks = S.parse_tokens("He felt New York has a chance")
    ms = S.detect_mentions(toks)
    assert S.masked_sentence(toks, ms[0]) == "He felt __entity__ has a chance"
    assert S.masked_sentence(toks, ms[1]) == "He felt New York has a __entity__"


def test_capitalize_span_rule():
    # batched_main_NER.py:327-335: capitalize iff first TWO letters lowercase
    assert S.capitalize_span("new york") == "New York"
    assert S.capitalize_span("eGFR") == "eGFR"       # second letter uppercase
    assert S.capitalize_span("a") == "a"             # len 1 untouched
    assert S.capitalize_span("iPhone") == "iPhone"   # second letter uppercase
    assert S.capitalize_span("McDonald") == "McDonald"


def test_ci_probe_template():
    # "a entity" — deliberately ungrammatical (batched_main_NER.py:339)
    assert S.ci_probe("new york") == "New York is a entity"


def test_common_span_filter():
    # filter_common_noun_spans (common.py:82-113): drop iff ALL tokens common
    toks = S.parse_tokens("Paris hotel opened")
    ms = S.detect_mentions(toks)
    common = frozenset({"hotel"})
    kept = S.filter_common_spans(toks, ms, common)
    # "Paris hotel" is one span (both nounish); "Paris" not common -> kept
    assert len(kept) == len(ms)
    toks2 = S.parse_tokens("the hotel closed")
    ms2 = S.detect_mentions(toks2)
    assert S.filter_common_spans(toks2, ms2, common) == []


def test_blank_probe():
    # batched_main_NER.py:158-163
    assert S.is_blank_probe("something :__entity__")
    assert S.is_blank_probe("something :__entity__\n")
    assert not S.is_blank_probe("Parkinsons:__entity__ is bad")


def test_numeric_token():
    assert S.is_integer_token("60")
    assert not S.is_integer_token("5-2")
    assert not S.is_integer_token("1880s")


@given(st.lists(st.booleans(), max_size=30))
def test_span_invariants(bits):
    """Property: sum of mention lengths == count of nounish tokens; mentions
    are disjoint maximal runs in order."""
    toks = [S.Token(f"w{i}", b) for i, b in enumerate(bits)]
    ms = S.detect_mentions(toks)
    assert sum(m.end_tok - m.begin_tok + 1 for m in ms) == sum(bits)
    prev_end = -2
    for m in ms:
        assert m.begin_tok > prev_end + 1  # maximality: gap before each run
        assert all(toks[i].nounish for i in range(m.begin_tok, m.end_tok + 1))
        prev_end = m.end_tok


@given(st.lists(st.booleans(), max_size=30))
def test_bio_wellformed(bits):
    from unsupervised_ner_spark.kernel.bio import emit_bio

    toks = [S.Token(f"w{i}", b) for i, b in enumerate(bits)]
    ms = S.detect_mentions(toks)
    tags = emit_bio(S.span_bitmap(toks), ["X"] * len(ms))
    assert len(tags) == len(bits)
    for i, t in enumerate(tags):
        if t.startswith("I_"):
            assert tags[i - 1] in ("B_X", "I_X")


def test_poslite_numbers_are_nounish():
    # CD is in noun_tags (common.py:11)
    assert S.is_nounish("60")
    assert S.is_nounish("1880s")


def test_poslite_function_words():
    for w in ["the", "is", "a", "He", "felt", "has", "to", "and"]:
        assert not S.is_nounish(w), w
    for w in ["York", "engineer", "Mesothelioma", "eGFR", "nFerence"]:
        assert S.is_nounish(w), w
