"""Divergence report: POS-lite heuristic mentions vs POS-tag-driven mentions
(VERDICT r01 "Next round" item 1) on the canned synthetic corpus.

Writes POS_DIVERGENCE.md with per-category counts and examples, quantifying
where the round-1 heuristic disagrees with the reference-faithful
noun_tags-run path (pipeline/pos.py) under the deterministic fixture tagger.

Usage: python scripts/pos_divergence.py [n_pages]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from unsupervised_ner_spark.pipeline import pos  # noqa: E402
from unsupervised_ner_spark.pipeline.mentions import (  # noqa: E402
    sentences_to_tokens,
    tokens_to_mentions,
)
from unsupervised_ner_spark.pipeline.synth import synth_pages  # noqa: E402
from unsupervised_ner_spark.pipeline.text import pages_to_sentences  # noqa: E402
from unsupervised_ner_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    spark = get_spark("pos_divergence", cores=8, shuffle_partitions=8)
    sentences = pages_to_sentences(synth_pages(spark, n_pages)).cache()

    lite = tokens_to_mentions(sentences_to_tokens(sentences)).select(
        "url", "sent_idx", "begin_tok", "end_tok", "surface"
    )
    tagged = pos.mentions_from_tagged_tokens(pos.tagged_tokens(sentences)).select(
        "url", "sent_idx", "begin_tok", "end_tok", "surface"
    )

    keys = ["url", "sent_idx", "begin_tok", "end_tok"]
    both = lite.join(tagged, keys + ["surface"]).count()
    lite_only = lite.join(tagged, keys + ["surface"], "left_anti")
    pos_only = tagged.join(lite, keys + ["surface"], "left_anti")
    n_lite, n_pos = lite.count(), tagged.count()
    n_lite_only, n_pos_only = lite_only.count(), pos_only.count()

    ex_lite = [r.surface for r in
               lite_only.select("surface").distinct().orderBy("surface").limit(15).collect()]
    ex_pos = [r.surface for r in
              pos_only.select("surface").distinct().orderBy("surface").limit(15).collect()]
    n_sents = sentences.count()

    out = f"""# POS-lite vs POS-tagged mention divergence

Corpus: {n_pages} synthetic pages ({n_sents} sentences; reference canned
corpus + templated biomedical sentences, pipeline/synth.py), marker
sentences included (both paths share marker dispatch, so divergence is
confined to unmarked text).

| metric | count |
|---|---|
| POS-lite mentions (kernel/spans.py heuristic) | {n_lite} |
| POS-tagged mentions (pipeline/pos.py, noun_tags runs) | {n_pos} |
| identical spans (same url/sent/begin/end/surface) | {both} |
| POS-lite only | {n_lite_only} |
| POS-tagged only | {n_pos_only} |
| span agreement (Jaccard) | {both / max(n_lite + n_pos - both, 1):.4f} |

Example POS-lite-only surfaces (heuristic keeps, tagger drops/splits):
{chr(10).join('- ' + s for s in ex_lite) or '- (none)'}

Example POS-tagged-only surfaces (tagger keeps/merges, heuristic drops/splits):
{chr(10).join('- ' + s for s in ex_pos) or '- (none)'}

Interpretation: the production-faithful path is `kg_mentions_pos`
(tokens+tags ingestion, reference noun_tags semantics,
ensemble/utils/common.py:11,15-31); POS-lite remains the zero-dependency
fallback used when no tagger output is available. Both paths are
independently gated against DuckDB oracles.
"""
    (REPO / "POS_DIVERGENCE.md").write_text(out)
    print(out)
    spark.stop()


if __name__ == "__main__":
    main()
