"""POS-driven mention detection — the reference-faithful ingestion path.

The reference drives mention detection with a REAL POS tagger (jPTDP over
HTTP; config.json:1): tokens arrive as (word, tag) rows and a mention is a
maximal run of tokens whose tag is in ``noun_tags``
(/root/reference/ensemble/utils/common.py:11 noun_tags,
:15-31 generate_masked_sentences; TSV parsing batched_main_NER.py:91-108
extract_POS). Round 1 replaced this with the heuristic "POS-lite"
(kernel/spans.py) — this module closes that fidelity gap with TWO pieces:

1. ``mentions_from_tagged_tokens`` — the INGESTION CONTRACT: accepts
   externally-tagged tokens (url, sent_idx, token_idx, word, tag) from ANY
   tagger (jPTDP, spaCy, CoreNLP, ...) and replicates the exact noun_tags
   run semantics. This is what a production deployment feeds from its real
   tagger output.
2. ``synth_pos_tag`` / ``tagged_tokens`` — a deterministic rule tagger used
   ONLY to fabricate tagged fixtures for tests/benchmarks (no external
   tagger ships in this environment). It is SQL-expressible, so the DuckDB
   oracle (oracle_sql.kg_mentions_pos) replays it bit-identically — the
   correctness gate therefore verifies the run-grouping semantics, not the
   toy tagger.

Marker dispatch mirrors set_POS_based_on_entities (common.py:66-79): in a
sentence containing ``:__entity__`` markers, marked tokens get NNP and all
others RESET — POS is bypassed exactly as the reference bypasses it.

Scale: tagging is a narrow projection; the only exchange is the same
(url, sent_idx) run-grouping window the relational mention twin uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from unsupervised_ner_spark.kernel.constants import NOUN_TAGS, RESET_POS_TAG
from unsupervised_ner_spark.kernel.spans import FUNCTION_WORDS
from unsupervised_ner_spark.pipeline.mentions import (
    is_marked,
    strip_marker,
    tokens_col,
    tokens_to_mentions,
)

_FUNCTION_WORDS = sorted(FUNCTION_WORDS)


def synth_pos_tag(word: Column) -> Column:
    """Deterministic rule tagger over a marker-stripped token (fixture
    generator; see module docstring). Rule order matters and is replicated
    verbatim in oracle_sql.kg_mentions_pos."""
    w = F.lower(word)
    is_lower = (word == w) & (w != F.upper(word))  # str.islower()
    return (
        F.when(word.rlike("^[0-9]+$"), F.lit("CD"))
        .when(w.isin(*_FUNCTION_WORDS), F.lit("IN"))
        .when(~w.rlike("[a-z0-9]"), F.lit("SYM"))
        .when(is_lower & word.rlike("ly$"), F.lit("RB"))
        .when(is_lower & (F.length(word) > 4) & word.rlike("(ed|ing)$"), F.lit("VBD"))
        .when(word.rlike("^[A-Z]"), F.lit("NNP"))
        .otherwise(F.lit("NN"))
    )


def tagged_tokens(sentences: DataFrame) -> DataFrame:
    """sentences(url, sent_idx, sent) -> tagged tokens (url, sent_idx,
    token_idx, word, tag) with marker dispatch (common.py:66-79)."""
    toks = tokens_col(F.col("sent"))
    marker_mode = F.exists(toks, is_marked)
    df = sentences.select(
        "url", "sent_idx",
        marker_mode.alias("marker_mode"),
        F.posexplode(toks).alias("token_idx", "raw_word"),
    )
    raw = F.col("raw_word")
    word = strip_marker(raw)
    tag = F.when(
        F.col("marker_mode"),
        F.when(is_marked(raw), F.lit("NNP")).otherwise(F.lit(RESET_POS_TAG)),
    ).otherwise(synth_pos_tag(word))
    return df.select("url", "sent_idx", "token_idx", word.alias("word"), tag.alias("tag"))


def mentions_from_tagged_tokens(
    tokens: DataFrame, noun_tags: tuple[str, ...] = NOUN_TAGS
) -> DataFrame:
    """Externally-tagged tokens -> mentions: maximal runs of noun_tags
    membership (generate_masked_sentences, common.py:15-31). Accepts ANY
    tagger's output; the tag set defaults to the reference's noun_tags."""
    nounish = F.col("tag").isin(*noun_tags)
    return tokens_to_mentions(
        tokens.select("url", "sent_idx", "token_idx", "word", nounish.alias("nounish"))
    )
