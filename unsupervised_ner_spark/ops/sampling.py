"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus is rarely trained on whole: pipelines carve reproducible
subsets (ablations, per-language balancing, heldout splits). Random
`rand()` sampling is non-reproducible across runs and engines; these
operators key every decision on a content hash so the same inputs always
select the same rows — on Spark, on the DuckDB oracle, and on a re-run
after a failure (the same property the commit protocol relies on).

Cross-engine hash trick: both engines share md5 over strings, but not an
efficient hex→int conversion — so bucket membership compares the md5 HEX
PREFIX as a string against a hex threshold (ASCII ordering is identical in
both engines; the multimodal ops' hex-projection precedent). Three hex
chars give 4096 buckets — 0.24 per-mille granularity, plenty for sampling
rates.

Scale shapes:
- ``hash_sample``: stateless per-row filter — fully partition-local, no
  shuffle, pushes down past column pruning. The 100 TB default.
- ``balanced_sample``: EXACT per-stratum balancing needs a per-stratum
  rank, i.e. one shuffle on the stratum key + a per-partition sort. The
  stratum count table and its min are O(#strata) and broadcast. For
  approximately balanced subsets at extreme scale, prefer per-stratum
  ``hash_sample`` rates derived from the stratum counts (no global sort);
  the exact variant is for when the training recipe demands equal counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_BUCKETS = 4096  # 3 hex chars of md5


def _bucket_col(key) -> "F.Column":
    # cast: md5 needs string/binary; numeric ids stringify identically in
    # Spark and DuckDB (both render BIGINT as plain decimal)
    return F.substring(F.md5(key.cast("string")), 1, 3)


def hash_sample(
    documents: DataFrame, keep_buckets: int, key: str = "doc_id"
) -> DataFrame:
    """Keep rows whose md5(key) falls in the first ``keep_buckets`` of
    4096 hash buckets — a deterministic ~keep_buckets/4096 sample.
    Stateless and partition-local: no shuffle, reproducible everywhere."""
    if not 0 <= keep_buckets <= HASH_BUCKETS:
        raise ValueError(f"keep_buckets must be in [0, {HASH_BUCKETS}]")
    if keep_buckets == HASH_BUCKETS:
        # f"{4096:03x}" is the FOUR-char "1000", which sorts below most
        # 3-char hex prefixes — full keep must bypass the comparison
        return documents
    return documents.filter(_bucket_col(F.col(key)) < F.lit(f"{keep_buckets:03x}"))


def balanced_sample(
    documents: DataFrame, stratum: str = "lang", key: str = "doc_id"
) -> DataFrame:
    """Exact balanced downsampling: every stratum is cut to the size of
    the SMALLEST stratum, selecting rows in md5(key) order (deterministic,
    engine-portable, uncorrelated with content). Returns the kept rows as
    (key, stratum, rank) with rank in [1, min_stratum_size].

    One shuffle on the stratum key for the window rank; the stratum-count
    table and its min are O(#strata) — the min joins in as a broadcast
    1-row cross join, never a driver collect."""
    counts = documents.groupBy(stratum).agg(F.count("*").alias("n"))
    mn = counts.agg(F.min("n").cast("long").alias("min_n"))
    w = Window.partitionBy(stratum).orderBy(
        F.md5(F.col(key).cast("string")), F.col(key)
    )
    ranked = documents.select(
        key, stratum, F.row_number().over(w).cast("long").alias("rank")
    )
    return ranked.crossJoin(F.broadcast(mn)).filter(
        F.col("rank") <= F.col("min_n")
    ).select(key, stratum, "rank")
