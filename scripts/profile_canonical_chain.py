"""Round-6 stage profiler for the shared canonical-triples ER chain
(guide §1): time each stage cumulatively with the noop sink at sf0.1 so
the chain's cost decomposition is visible. Diagnostic only."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from unsupervised_ner_spark.caching import cache_scope, scoped_persist  # noqa: E402
from unsupervised_ner_spark.pipeline import er  # noqa: E402
from unsupervised_ner_spark.pipeline.runner import (  # noqa: E402
    run_pipeline,
    typed_mentions_from_tagged,
)
from unsupervised_ner_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(spark, label, fn, reps=2):
    best = None
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        with cache_scope():
            df = fn()
            df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{best:7.2f}  {label}", flush=True)


def main():
    spark = get_spark("profile_chain", cores=32, shuffle_partitions=32)

    def tagged():
        pages = entry._docs_as_pages(spark, SF)
        return run_pipeline(pages, lang_filter=None)["tagged"]

    def typed():
        return typed_mentions_from_tagged(scoped_persist(tagged()))

    def occ():
        return er.entity_occurrences(
            typed().select("url", "sent_idx", "mention_idx", "surface", "pred_group")
        )

    def nodes():
        return er.exact_canonical(occ())

    def edges():
        return er.fuzzy_edges(scoped_persist(nodes()))

    def resolved():
        _e, m = er.resolve_entities(occ())
        return m

    def triples_only():
        pages = entry._docs_as_pages(spark, SF)
        return run_pipeline(pages, lang_filter=None)["triples"]

    def canonical():
        return entry.q_kg_canonical_triples(spark, SF)

    def hits_q():
        return entry.q_kg_hits(spark, SF)

    # warm up session (codegen, python workers)
    t(spark, "warmup: tagged", tagged, reps=1)

    t(spark, "tagged (production tagging pass)", tagged)
    t(spark, "typed mentions", typed)
    t(spark, "entity occurrences", occ)
    t(spark, "exact_canonical nodes", nodes)
    t(spark, "fuzzy_edges (LSH + verify)", edges)
    t(spark, "resolve_entities (LSH + CC + stats)", resolved)
    t(spark, "triples only", triples_only)
    t(spark, "kg_canonical_triples (full)", canonical)
    t(spark, "kg_hits (canonical + 2-round HITS)", hits_q)
    spark.stop()


if __name__ == "__main__":
    main()
