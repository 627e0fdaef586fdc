"""Bucketed-table storage layout: shuffle-free co-located joins.

At 100 TB the dominant recurring cost of the KG chain is re-shuffling the
same fact tables on the same keys (canonical triples by ``subj_id``,
entity occurrences by ``norm_surface``, documents by ``doc_id``) for every
downstream join. Bucketing pays that shuffle ONCE at write time: a table
written with ``bucketBy(n, key)`` is physically hash-partitioned into
``n`` files per partition, the catalog records the layout, and every
subsequent equi-join between two tables bucketed on the same key with the
same bucket count plans WITHOUT an Exchange on either side (and, with
``sortBy``, without the sort) — verified by ``tests/test_bucketing.py``
asserting the physical plan has zero Exchange nodes.

Sizing rule of thumb at scale: buckets ~= total_size / target_file_size
(128-256 MB), rounded to a power of two so downstream engines can split
or coalesce evenly; bucket count is part of the table CONTRACT (both join
sides must match), so it is a config constant, not an adaptive value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed (optionally sort-bucketed) parquet table
    registered in the session catalog. ``path`` makes it an external
    table (required in this sandbox: keeps bytes out of the default
    warehouse dir). Bucketed writes shuffle once on the bucket key —
    that IS the point: the write absorbs the shuffle all readers skip."""
    w = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Equi-join two same-key/same-count bucketed tables. The plan must
    carry no Exchange (each side's bucketed scan already reports the
    required hash partitioning); callers can assert that via
    ``"Exchange" not in df._jdf.queryExecution().executedPlan().toString()``.
    """
    return spark.table(left_table).join(spark.table(right_table), on)
