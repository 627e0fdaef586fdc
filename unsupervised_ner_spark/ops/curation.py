"""End-to-end curation manifest — the composed "build the training set"
pipeline the individual operators exist for: quality classification ->
near-duplicate removal (keep the cluster representative) -> group-level
train/val/test split -> temperature-balanced mix sampling over the
SURVIVORS. One audit row per input document, flags for every decision, so
downstream consumers filter ``keep`` while auditors see exactly why each
dropped document was dropped.

Stage order matters and is part of the contract: the sqrt-mix cap is
computed over the quality+dedup SURVIVOR pool (a mix rank computed over
the raw corpus would re-admit documents whose cheaper twin was dropped
by dedup and under-fill sources whose docs were mostly boilerplate).

Scale posture is inherited from the parts: quality is one narrow scan,
dedup is the capped LSH chain + star-CC, split is stateless, and the mix
rank is one window per source over the survivor pool. The final manifest
assembly is doc_id-keyed equi-joins of decision tables each no larger
than the corpus — no broadcast of anything corpus-sized, no new shuffle
shape beyond the parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unsupervised_ner_spark.ops.dedup import dedup_clusters
from unsupervised_ner_spark.ops.sampling import split_assign, sqrt_mix_sample
from unsupervised_ner_spark.ops.textstats import doc_stats, quality_class


def curated_manifest(documents: DataFrame, k_mix: int = 4) -> DataFrame:
    """documents(doc_id, text, lang, source, ...) -> one row per input doc:
    (doc_id, lang, source, quality, is_dup, split, keep).

    ``is_dup`` is true for every non-representative member of a near-dup
    cluster (the representative — the cluster's min doc_id — survives).
    ``keep`` = quality == 'good' AND NOT is_dup AND selected by the
    sqrt-mix cap over the survivor pool."""
    base = documents.select("doc_id", "lang", "source")
    quality = quality_class(doc_stats(documents))
    clusters = dedup_clusters(documents).select(
        "doc_id", (F.col("doc_id") != F.col("cluster_id")).alias("is_dup")
    )
    splits = split_assign(documents).select("doc_id", "split")

    flagged = (
        base.join(quality, "doc_id")
        .join(clusters, "doc_id", "left")
        .join(splits, "doc_id")
        .withColumn("is_dup", F.coalesce(F.col("is_dup"), F.lit(False)))
    )
    survivors = flagged.filter(
        (F.col("quality") == "good") & ~F.col("is_dup")
    ).select("doc_id", "source")
    mix_kept = sqrt_mix_sample(survivors, k=k_mix).select(
        "doc_id", F.lit(True).alias("mix_keep")
    )
    return (
        flagged.join(mix_kept, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "source",
            "quality",
            "is_dup",
            "split",
            (
                (F.col("quality") == "good")
                & ~F.col("is_dup")
                & F.coalesce(F.col("mix_keep"), F.lit(False))
            ).alias("keep"),
        )
    )


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass column profiler — the data-quality summary a pipeline
    publishes per ingest batch (row/null/distinct counts, min/max) so
    schema drift and null storms surface BEFORE downstream jobs consume
    the batch. Output: one row per profiled column with n_rows, n_null,
    n_distinct (null-excluding, like SQL COUNT(DISTINCT)), and min/max
    rendered as strings (profile only integer/string/date columns: float
    string-rendering is engine-dependent).

    Scale shape: ONE aggregate pass computes every column's statistics
    together (no per-column rescans), then an in-place explode unpivots
    the 1-row result — the explode input is one row, so the unpivot is
    free. countDistinct plans as partial aggregates (no naive global
    distinct); for approximate-tolerant dashboards swap in
    approx_count_distinct, documented knob."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).cast("long").alias(f"{c}__nn"),
            F.countDistinct(F.col(c)).cast("long").alias(f"{c}__nd"),
            F.min(F.col(c)).cast("string").alias(f"{c}__mn"),
            F.max(F.col(c)).cast("string").alias(f"{c}__mx"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"{c}__nn").alias("n_null"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__mn").alias("min_s"),
                F.col(f"{c}__mx").alias("max_s"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")
