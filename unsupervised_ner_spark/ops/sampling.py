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


def isqrt_floor_col(n: "F.Column") -> "F.Column":
    """EXACT integer floor square root of a non-negative BIGINT column.

    floor(sqrt(double)) alone can misround near perfect squares once
    1/(2*sqrt(n)) is comparable to the double ulp (the icbrt_ceil
    lesson), so the float estimate is corrected by exact integer
    comparisons — one step each way suffices because the correctly-
    rounded double sqrt is off by at most one integer. Same expression
    shape on the DuckDB side (oracle_sql._isqrt_sql)."""
    est = F.floor(F.sqrt(n.cast("double"))).cast("long")
    r = F.when(est * est > n, est - 1).otherwise(est)
    return F.when((r + 1) * (r + 1) <= n, r + 1).otherwise(r)


def sqrt_mix_sample(
    documents: DataFrame,
    k: int = 4,
    group: str = "source",
    key: str = "doc_id",
) -> DataFrame:
    """Temperature-balanced training-mix sampling: cap every group at
    ``k * isqrt(n_group)`` documents (selected in md5 order), i.e. keep
    rate ~ n^(-1/2) — head sources are downsampled sublinearly while tail
    sources are kept whole, the standard alpha=0.5 mix-flattening recipe
    expressed in EXACT integer arithmetic (no float rates, so both
    engines and every re-run agree bit-for-bit).

    Scale shape: the per-group count table is group-bounded (not corpus-
    sized) and joins back broadcast-or-shuffle by size; the md5-order
    rank is one window per group — same posture as balanced_sample, with
    the same caveat that a pathological single-group corpus degrades to
    one sort key. Returns (key, group, rank, cap, n_docs)."""
    counts = documents.groupBy(group).agg(F.count("*").cast("long").alias("n_docs"))
    capped = counts.select(
        group,
        "n_docs",
        F.least(
            F.col("n_docs"), F.lit(k).cast("long") * isqrt_floor_col(F.col("n_docs"))
        ).alias("cap"),
    )
    w = Window.partitionBy(group).orderBy(
        F.md5(F.col(key).cast("string")), F.col(key)
    )
    ranked = documents.select(
        key, group, F.row_number().over(w).cast("long").alias("rank")
    )
    return ranked.join(capped, group).filter(F.col("rank") <= F.col("cap")).select(
        key, group, "rank", "cap", "n_docs"
    )


# train/val/test bucket thresholds over the 4096 md5 buckets:
# [0, 3277) train (~80.0%), [3277, 3687) val (~10.0%), rest test.
SPLIT_TRAIN_BUCKETS = 3277
SPLIT_VAL_BUCKETS = 3687


def split_assign(
    documents: DataFrame,
    group: str = "source",
    train_buckets: int = SPLIT_TRAIN_BUCKETS,
    val_buckets: int = SPLIT_VAL_BUCKETS,
) -> DataFrame:
    """Deterministic GROUP-LEVEL train/val/test split: every row inherits
    the split of its ``group`` (default the document's source/domain), so
    same-source documents — the strongest trivial-leakage channel, e.g. a
    boilerplate-heavy site template — can never straddle splits by
    construction. The group's md5 hex prefix picks the split (the
    hash_sample trick), so the assignment is reproducible on both engines
    and stable under corpus growth: adding documents never reassigns an
    existing group.

    Stateless per-row projection — no shuffle, no group table; the split
    is a pure function of the group string."""
    if not 0 < train_buckets <= val_buckets <= HASH_BUCKETS:
        raise ValueError("need 0 < train_buckets <= val_buckets <= 4096")
    b = _bucket_col(F.col(group))
    split = (
        F.when(b < F.lit(f"{train_buckets:03x}"), F.lit("train"))
        .when(b < F.lit(f"{val_buckets:03x}"), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return documents.select("doc_id", group, split.alias("split"))


def split_leakage(
    documents: DataFrame,
    group: str = "source",
    train_buckets: int = SPLIT_TRAIN_BUCKETS,
    val_buckets: int = SPLIT_VAL_BUCKETS,
) -> DataFrame:
    """Near-duplicate LEAKAGE screen over the group-level split: MinHash-
    LSH candidate pairs (ops/dedup.py, adaptive bucket cap) annotated with
    each side's split and ``leak = split_a <> split_b`` — the cross-split
    near-dups that contaminate held-out evaluation even though the
    group-level assignment already blocks same-source leakage (a near-dup
    of a test doc syndicated on a train-split source is exactly what this
    catches). Emits ALL candidate pairs with the flag rather than only
    leaks, so the output doubles as the audit table.

    Scale shape: the pair table is the LSH output (bucketed + capped,
    never corpus-quadratic); the split side is a narrow stateless
    projection of (doc_id, split) joined twice on doc_id — two shuffle
    equi-joins keyed on the pair endpoints, each at most pair-table-sized
    after pushdown. The projection is recomputed per join side instead of
    persisted: re-scanning two pruned columns is cheaper than pinning a
    corpus-sized cache."""
    from unsupervised_ner_spark.ops.dedup import lsh_bucket_pairs

    pairs = lsh_bucket_pairs(documents)
    splits = split_assign(documents, group, train_buckets, val_buckets)
    sa = splits.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    sb = splits.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "split_a",
            "split_b",
            (F.col("split_a") != F.col("split_b")).alias("leak"),
        )
    )


def mix_token_plan(
    documents: DataFrame, budget: int = 1_000_000, group: str = "source"
) -> DataFrame:
    """Token-budget mix planner: given a target training-token ``budget``,
    allocate it across groups proportionally to isqrt(n_tokens) — the
    alpha=0.5 temperature weighting expressed over TOKEN mass rather than
    document counts (the quantity training cost actually scales with; see
    fertility_stats for why doc counts mislead). Emits per group the
    integer allocation and the implied repeat factor:

      planned_tokens = (budget * isqrt(n_tokens)) div sum_g isqrt(n_tokens)
      epochs_milli   = (planned_tokens * 1000) div n_tokens

    epochs_milli > 1000 means the group repeats (upsampled tail);
    < 1000 means it is subsampled. All arithmetic is exact BIGINT on both
    engines, so the plan is reproducible bit-for-bit. ``budget`` must keep
    budget * isqrt(total tokens) below 2^63 (budget <= 2^31 is always
    safe; plan in kilotokens/megatokens above that) — ANSI mode fails
    loudly on overflow rather than wrapping.

    Scale shape: one map-side-combining token aggregate keyed on the
    group; everything after runs on the group-bounded table with the
    weight total attached as a 1-row broadcast (the balanced_sample
    pattern). Empty groups (zero tokens) are excluded — they cannot
    receive an allocation and would divide by zero in the epoch ratio."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    from unsupervised_ner_spark.ops.textstats import tokens_ws

    per = (
        documents.groupBy(group)
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.size(tokens_ws(F.col("text")))).cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
        .withColumn("w_isqrt", isqrt_floor_col(F.col("n_tokens")))
    )
    tot = per.agg(F.sum("w_isqrt").cast("long").alias("w_total"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            group,
            "n_docs",
            "n_tokens",
            "w_isqrt",
            F.expr(f"({budget} * w_isqrt) div w_total").alias("planned_tokens"),
        )
        .withColumn(
            "epochs_milli", F.expr("(planned_tokens * 1000) div n_tokens")
        )
    )
