"""Mention detection — declarative Spark SQL variant (W1 gaps-and-islands).

Two twin implementations exist by design:

1. THIS module: pure Spark SQL (explode -> window run-grouping -> agg) —
   independently verifiable against an ANSI-SQL oracle (DuckDB) and useful
   when mentions are needed as a standalone relational table.
2. The production tagging path (pipeline/tagging.py) computes the same spans
   *inside* the Arrow-batched sentence UDF (per SURVEY.md §2.7 W1: "cheaper
   than 2 window passes" — zero shuffle, sentence-local).

Tests assert the two agree on every fixture sentence.

POS-lite noun rule — EXACTLY the kernel's ``is_nounish`` (kernel/spans.py),
expressed in SQL; marker semantics per ensemble/utils/common.py:66-79.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from unsupervised_ner_spark.kernel.constants import INPUT_MASK_TAG, MASK_TAG
from unsupervised_ner_spark.kernel.spans import FUNCTION_WORDS

# SQL-literal twin of kernel.spans.FUNCTION_WORDS
_FUNCTION_WORDS = sorted(FUNCTION_WORDS)


def tokens_col(sent: Column) -> Column:
    """Whitespace tokenization, collapsing runs like str.split()."""
    return F.filter(F.split(sent, r"\s+"), lambda t: t != F.lit(""))


def strip_marker(tok: Column) -> Column:
    """Remove ALL occurrences of ':__entity__' (str.replace semantics,
    common.py:74)."""
    return F.replace(tok, F.lit(INPUT_MASK_TAG), F.lit(""))


def is_marked(tok: Column) -> Column:
    return tok.endswith(INPUT_MASK_TAG)


def poslite_nounish(word: Column) -> Column:
    """SQL twin of kernel.spans.is_nounish (see there for the rule)."""
    w = F.lower(word)
    is_lower = (word == w) & (w != F.upper(word))  # str.islower()
    return (
        ~w.isin(*_FUNCTION_WORDS)
        & w.rlike("[a-z0-9]")
        & ~(is_lower & w.rlike("ly$"))
        & ~(is_lower & (F.length(w) > 4) & w.rlike("(ed|ing)$"))
    )


def sentences_to_tokens(sentences: DataFrame) -> DataFrame:
    """sentences(url, sent_idx, sent) -> tokens(url, sent_idx, token_idx,
    word, nounish). Narrow (flatMap).

    ``marker_mode`` and the token array are computed in a pre-projection
    carried through the generate as one struct: selecting them inline with
    ``posexplode`` makes ExtractGenerator hoist the aliases ABOVE the
    Generate, re-running exists(filter(split(sent))) once per TOKEN row
    instead of once per sentence (measured 3.4 s vs 0.4 s on the sf0.1
    token stage; guide §1.2 "per-task work")."""
    toks = tokens_col(F.col("sent"))
    marker_mode = F.exists(toks, is_marked)
    pre = sentences.select(
        "url",
        "sent_idx",
        F.struct(marker_mode.alias("mm"), toks.alias("tk")).alias("p"),
    )
    df = pre.select(
        "url",
        "sent_idx",
        F.col("p.mm").alias("marker_mode"),
        F.posexplode("p.tk").alias("token_idx", "raw_word"),
    )
    raw = F.col("raw_word")
    nounish = F.when(F.col("marker_mode"), is_marked(raw)).otherwise(
        poslite_nounish(raw)
    )
    return df.select(
        "url",
        "sent_idx",
        "token_idx",
        strip_marker(raw).alias("word"),
        nounish.alias("nounish"),
    )


def tokens_to_mentions(tokens: DataFrame) -> DataFrame:
    """W1: maximal nounish runs -> mentions(url, sent_idx, mention_idx,
    begin_tok, end_tok, surface). One shuffle on (url, sent_idx) — only used
    by the standalone relational variant; the production path is shuffle-free.
    """
    w = Window.partitionBy("url", "sent_idx").orderBy("token_idx")
    is_start = F.col("nounish") & (
        F.lag("nounish", 1, False).over(w) == F.lit(False)
    )
    grp = F.sum(F.when(is_start, 1).otherwise(0)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    runs = tokens.withColumn("grp", grp).filter("nounish")
    return (
        runs.groupBy("url", "sent_idx", "grp")
        .agg(
            F.min("token_idx").alias("begin_tok"),
            F.max("token_idx").alias("end_tok"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("token_idx", "word"))
                    ),
                    lambda s: s["word"],
                ),
                " ",
            ).alias("surface"),
        )
        .withColumn("mention_idx", F.col("grp") - 1)
        .drop("grp")
    )


def with_masks(mentions: DataFrame, sentences: DataFrame) -> DataFrame:
    """Attach CS masked sentence + CI probe to each mention (T1/T2) via a
    broadcast-friendly equi-join back to the sentence row."""
    stripped = F.transform(tokens_col(F.col("sent")), strip_marker)
    sent_tok = sentences.select(
        "url", "sent_idx", stripped.alias("toks"), "sent"
    )
    j = mentions.join(sent_tok, ["url", "sent_idx"])
    n = F.size(F.col("toks"))
    b, e = F.col("begin_tok"), F.col("end_tok")
    masked = F.array_join(
        F.concat(
            F.slice(F.col("toks"), 1, b),
            F.array(F.lit(MASK_TAG)),
            F.slice(F.col("toks"), e + 2, n - e - 1),
        ),
        " ",
    )
    # capitalize rule (batched_main_NER.py:327-335): first TWO letters lowercase
    cap = F.transform(
        F.split(F.col("surface"), " "),
        lambda t: F.when(
            t.rlike("^[a-z][a-z]"),
            F.concat(F.upper(t.substr(F.lit(1), F.lit(1))), t.substr(F.lit(2), F.length(t))),
        ).otherwise(t),
    )
    ci = F.concat(F.array_join(cap, " "), F.lit(" is a entity"))
    return j.select(
        "url",
        "sent_idx",
        "mention_idx",
        "begin_tok",
        "end_tok",
        "surface",
        masked.alias("masked_sent"),
        ci.alias("ci_probe"),
    )
