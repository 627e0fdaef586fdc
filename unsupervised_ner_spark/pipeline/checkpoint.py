"""Checkpoint / lineage / resume (north rule: "resumable from checkpoint
with per-partition lineage + metrics").

Table format: Iceberg when its runtime jars are on the classpath (production
posture per BASELINE.json), else partitioned parquet with identical layout —
gated by ``table_format()``. The resume algebra is format-agnostic:

- every pages-derived stage is partitioned by ``pbucket =
  pmod(xxhash64(url), n_buckets)`` (the analogue of Iceberg
  ``bucket(64, url)`` partitioning in FIXTURES.md §1);
- a stage write appends one lineage row per bucket:
  (stage, pbucket, row_count, checksum) where checksum is an
  order-independent XOR of per-row xxhash64 (paired with row_count so
  cancellation needs identical duplicate rows) — cheap, associative,
  partition-parallel, overflow-free under ANSI mode;
- resume = anti-join the input's buckets against the lineage table's
  completed buckets for that stage, recompute only the gap
  (reference analog: append-only logs + per-sentence flush,
  batched_main_NER.py:77-79,550).
"""

from __future__ import annotations

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
    return [c for c, t in df.dtypes if not t.startswith(("array", "struct", "map", "binary"))]


def write_stage(
    df: DataFrame,
    root: str,
    stage: str,
    key: str = "url",
    n_buckets: int = N_BUCKETS_DEFAULT,
    mode: str = "append",
) -> None:
    """Write a stage table partitioned by pbucket + its lineage rows."""
    out = with_bucket(df, key, n_buckets)
    out.write.mode(mode).partitionBy("pbucket").parquet(f"{root}/{stage}")
    lineage = (
        out.groupBy("pbucket")
        .agg(
            F.count("*").alias("row_count"),
            F.bit_xor(F.xxhash64(*_checksum_cols(df))).alias("checksum"),
        )
        .withColumn("stage", F.lit(stage))
    )
    lineage.write.mode("append").parquet(f"{root}/_lineage")


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
    """The lineage/metrics table (stage, pbucket, row_count, checksum)."""
    return spark.read.parquet(f"{root}/_lineage")
