"""End-to-end orchestration: pages -> sentences -> tagged -> tags/triples.

The full single-model chain is ONE narrow pipeline (scan -> project/filter ->
posexplode -> ArrowEvalPython -> project) — Catalyst plans it without any
exchange; see SURVEY.md §3.1 "Spark re-expression".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unsupervised_ner_spark.pipeline.tagging import (
    tag_sentences,
    tagged_to_token_tags,
)
from unsupervised_ner_spark.pipeline.text import pages_to_sentences
from unsupervised_ner_spark.pipeline.triples import tagged_to_triples


def run_pipeline(
    pages: DataFrame,
    model: str = "a100",
    lang_filter: str | None = "en",
    detail: bool = False,
    **tag_kwargs,
) -> dict[str, DataFrame]:
    """Returns the lazily-planned stage DataFrames keyed by stage name."""
    if lang_filter:
        # partition-prunable predicate at the scan (SURVEY.md §4.2)
        pages = pages.filter(F.col("lang") == lang_filter)
    sentences = pages_to_sentences(pages)
    tagged = tag_sentences(sentences, model=model, detail=detail, **tag_kwargs)
    return {
        "pages": pages,
        "sentences": sentences,
        "tagged": tagged,
        "tags": tagged_to_token_tags(tagged),
        "triples": tagged_to_triples(tagged),
    }


def typed_mentions_from_tagged(tagged: DataFrame) -> DataFrame:
    """Flatten the production tagged output to the typed-mention table
    (url, sent_idx, mention_idx, begin_tok, end_tok, surface, pred_group,
    prediction) — the same shape typing_sql.typed_mentions_relational emits.

    Purpose: downstream consumers (ER, the canonical-triple end table) can
    feed off the SINGLE narrow tagging pass instead of re-deriving the whole
    mention/typing chain through the shuffle-heavy relational twin (VERDICT
    r02 "What's wrong" 2 — kg_canonical_triples ran the corpus twice).
    Narrow: one posexplode, no exchange."""
    m = tagged.select(
        "url", "sent_idx", F.posexplode("mentions").alias("mention_idx", "m")
    )
    return m.select(
        "url",
        "sent_idx",
        "mention_idx",
        F.col("m.begin_tok").alias("begin_tok"),
        F.col("m.end_tok").alias("end_tok"),
        F.col("m.surface").alias("surface"),
        F.split(F.col("m.prediction"), r"\[")[0].alias("pred_group"),
        F.col("m.prediction").alias("prediction"),
    )
