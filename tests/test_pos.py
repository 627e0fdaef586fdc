"""POS ingestion path (pipeline/pos.py): noun_tags run semantics over
externally-tagged tokens, the fixture tagger, and marker dispatch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from unsupervised_ner_spark.pipeline import pos


def test_mentions_from_hand_tagged_tokens(spark):
    """The ingestion contract: tokens+tags from an 'external tagger' (here
    hand-written, jPTDP-style) -> maximal noun_tags runs. Expected spans
    hand-derived from common.py:15-31 semantics."""
    # "The serious disease was treated with imatinib mesylate in 2020 ."
    rows = [
        ("u", 0, 0, "The", "DT"),        # not a noun tag
        ("u", 0, 1, "serious", "JJ"),    # JJ IS in noun_tags -> joins run
        ("u", 0, 2, "disease", "NN"),
        ("u", 0, 3, "was", "VBD"),
        ("u", 0, 4, "treated", "VBN"),
        ("u", 0, 5, "with", "IN"),
        ("u", 0, 6, "imatinib", "NN"),
        ("u", 0, 7, "mesylate", "NN"),
        ("u", 0, 8, "in", "IN"),
        ("u", 0, 9, "2020", "CD"),       # CD IS in noun_tags
        ("u", 0, 10, ".", "."),
    ]
    df = spark.createDataFrame(
        rows, "url string, sent_idx long, token_idx long, word string, tag string"
    )
    got = {
        (r.begin_tok, r.end_tok): r.surface
        for r in pos.mentions_from_tagged_tokens(df).collect()
    }
    assert got == {
        (1, 2): "serious disease",
        (6, 7): "imatinib mesylate",
        (9, 9): "2020",
    }


def test_marker_dispatch_bypasses_pos(spark):
    s = spark.createDataFrame(
        [("u", 0, "Mesothelioma:__entity__ is caused by asbestos:__entity__ . ")],
        "url string, sent_idx long, sent string",
    )
    toks = pos.tagged_tokens(s)
    tags = {r.word: r.tag for r in toks.collect()}
    assert tags["Mesothelioma"] == "NNP" and tags["asbestos"] == "NNP"
    assert tags["is"] == "RESET" and tags["caused"] == "RESET"
    m = pos.mentions_from_tagged_tokens(toks).collect()
    assert sorted(r.surface for r in m) == ["Mesothelioma", "asbestos"]


@pytest.mark.parametrize(
    "word,expected",
    [
        ("2020", "CD"),
        ("the", "IN"),
        (",", "SYM"),
        ("slowly", "RB"),
        ("treated", "VBG"),   # suffix rule
        ("running", "VBG"),
        ("flew", "VBD"),      # verb lexicon: bare past POS-lite misses
        ("beginning", "NN"),  # -ing noun exception
        ("Paris", "NNP"),
        ("disease", "NN"),
        ("red", "NN"),       # short -ed word: len <= 4 keeps NN
        ("Fly", "NNP"),      # capitalized beats the -ly rule (islower false)
    ],
)
def test_synth_pos_tag_rules(spark, word, expected):
    got = (
        spark.range(1)
        .select(pos.synth_pos_tag(F.lit(word)).alias("t"))
        .collect()[0]
        .t
    )
    assert got == expected
