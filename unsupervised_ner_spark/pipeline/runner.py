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
