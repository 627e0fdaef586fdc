"""Checkpoint / lineage / resume (north rule: "resumable from checkpoint
with per-partition lineage + metrics").

Table format: Iceberg when its runtime jars are on the classpath (production
posture per BASELINE.json), else partitioned parquet with identical layout —
gated by ``table_format()``. The resume algebra is format-agnostic:

- every pages-derived stage is partitioned by ``pbucket =
  pmod(xxhash64(url), n_buckets)`` (the analogue of Iceberg
  ``bucket(64, url)`` partitioning in FIXTURES.md §1) AND by a per-write
  ``wtoken``;
- COMMIT PROTOCOL (crash-safe, replay-idempotent): data files land first
  under ``pbucket=*/wtoken=<token>``, then one lineage row per bucket —
  (stage, wtoken, pbucket, row_count, checksum), computed by RE-READING the
  files actually written (never by re-evaluating the possibly-
  nondeterministic input plan) — is appended to ``_lineage``. The lineage
  row IS the commit marker: readers (``stage_read``) and resume
  (``completed_buckets``) only see wtokens present in lineage, so a crash
  between the data write and the lineage append leaves invisible orphan
  files, not duplicates. A replay with the SAME wtoken (e.g. a restarted
  streaming epoch) is skipped up front — exactly-once visible semantics
  over an at-least-once writer;
- checksum is an order-independent XOR of per-row xxhash64 (paired with
  row_count so cancellation needs identical duplicate rows) — cheap,
  associative, partition-parallel, overflow-free under ANSI mode;
- resume = anti-join the input's buckets against the lineage table's
  committed buckets for that stage, recompute only the gap
  (reference analog: append-only logs + per-sentence flush,
  batched_main_NER.py:77-79,550).
"""

from __future__ import annotations

import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS_DEFAULT = 64


def table_format(spark: SparkSession) -> str:
    """'iceberg' when the Iceberg Spark runtime is available, else 'parquet'."""
    try:
        spark._jvm.org.apache.iceberg.spark.SparkCatalog  # noqa: SLF001
        return "iceberg"
    except Exception:
        return "parquet"


def with_bucket(df: DataFrame, key: str = "url", n_buckets: int = N_BUCKETS_DEFAULT) -> DataFrame:
    return df.withColumn("pbucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)))


def _checksum_cols(df: DataFrame) -> list[str]:
    return [
        c for c, t in df.dtypes
        if c not in ("pbucket", "wtoken")
        and not t.startswith(("array", "struct", "map", "binary"))
    ]


def is_committed(spark: SparkSession, root: str, stage: str, wtoken: str) -> bool:
    """True iff a lineage commit marker exists for (stage, wtoken)."""
    path = Path(root) / "_lineage"
    if not path.exists():
        return False
    return (
        spark.read.parquet(str(path))
        .filter((F.col("stage") == stage) & (F.col("wtoken") == wtoken))
        .limit(1)
        .count()
        > 0
    )


def write_stage(
    df: DataFrame,
    root: str,
    stage: str,
    key: str = "url",
    n_buckets: int = N_BUCKETS_DEFAULT,
    wtoken: str | None = None,
) -> str:
    """Write a stage table partitioned by (pbucket, wtoken) + its lineage
    commit rows. Returns the wtoken used.

    ``wtoken`` identifies the write: pass a stable id (e.g. a streaming
    epoch) to make replays idempotent — an already-committed token is a
    no-op. Default: a fresh uuid (plain batch append).
    """
    spark = df.sparkSession
    token = wtoken or uuid.uuid4().hex[:16]
    if wtoken is not None and is_committed(spark, root, stage, token):
        return token  # replayed epoch: already visible, skip entirely
    out = with_bucket(df, key, n_buckets).withColumn("wtoken", F.lit(token))
    out.write.mode("append").partitionBy("pbucket", "wtoken").parquet(f"{root}/{stage}")
    # lineage FROM THE WRITTEN FILES (not the input plan), then the commit
    written = spark.read.parquet(f"{root}/{stage}").filter(F.col("wtoken") == token)
    lineage = (
        written.groupBy("pbucket")
        .agg(
            F.count("*").alias("row_count"),
            F.bit_xor(F.xxhash64(*_checksum_cols(written))).alias("checksum"),
        )
        .withColumn("stage", F.lit(stage))
        .withColumn("wtoken", F.lit(token))
    )
    lineage.write.mode("append").parquet(f"{root}/_lineage")
    return token


def stage_read(spark: SparkSession, root: str, stage: str) -> DataFrame:
    """Committed rows of a stage: only wtokens with a lineage marker are
    visible (orphans from crashed writes are filtered out)."""
    data = spark.read.parquet(f"{root}/{stage}")
    committed = (
        spark.read.parquet(f"{root}/_lineage")
        .filter(F.col("stage") == stage)
        .select("wtoken")
        .distinct()
    )
    return data.join(F.broadcast(committed), "wtoken").drop("wtoken", "pbucket")


def completed_buckets(spark: SparkSession, root: str, stage: str) -> DataFrame:
    path = Path(root) / "_lineage"
    if not path.exists():
        return spark.createDataFrame([], "pbucket long")
    return (
        spark.read.parquet(str(path))
        .filter(F.col("stage") == stage)
        .select("pbucket")
        .distinct()
    )


def resume_filter(
    pages: DataFrame,
    root: str,
    stage: str,
    key: str = "url",
    n_buckets: int = N_BUCKETS_DEFAULT,
) -> DataFrame:
    """Input rows whose bucket has NOT been committed for ``stage`` —
    broadcast anti-join (the completed-bucket list is tiny)."""
    spark = pages.sparkSession
    done = completed_buckets(spark, root, stage)
    return with_bucket(pages, key, n_buckets).join(
        F.broadcast(done), "pbucket", "left_anti"
    ).drop("pbucket")


def stage_metrics(spark: SparkSession, root: str) -> DataFrame:
    """The lineage/metrics table (stage, wtoken, pbucket, row_count, checksum)."""
    return spark.read.parquet(f"{root}/_lineage")
