"""Bucketed-table co-located join: the written layout must eliminate the
join-time shuffle (ops/bucketing.py). Physical-plan assertions, not just
row counts — the artifact of the 100 TB posture."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from unsupervised_ner_spark.ops.bucketing import colocated_join, write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def test_bucketed_join_has_no_exchange(spark):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("grp"),
    )
    stats = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 3).alias("score"),
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a real join strategy decision (no broadcast escape hatch)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        with tempfile.TemporaryDirectory() as tmp:
            write_bucketed(
                docs, "b_docs", ["doc_id"], 8, sort_cols=["doc_id"],
                path=f"{tmp}/b_docs",
            )
            write_bucketed(
                stats, "b_stats", ["doc_id"], 8, sort_cols=["doc_id"],
                path=f"{tmp}/b_stats",
            )
            j = colocated_join(spark, "b_docs", "b_stats", ["doc_id"])
            n = j.count()
            assert n == 2000
            plan = _plan(j)
            # the whole point: neither side shuffles
            assert "Exchange" not in plan, plan
            assert "SortMergeJoin" in plan
            # control: the same join on NON-bucketed frames must shuffle
            plain = docs.join(stats, ["doc_id"])
            plain.count()
            assert "Exchange" in _plan(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_stats")


def test_bucketed_aggregate_skips_exchange(spark):
    # a groupBy on the bucket key also reuses the layout: no Exchange
    # before the final aggregate
    grp = spark.range(0, 1000).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("v")
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        with tempfile.TemporaryDirectory() as tmp:
            write_bucketed(grp, "b_grp", ["k"], 4, path=f"{tmp}/b_grp")
            agg = spark.table("b_grp").groupBy("k").agg(F.sum("v").alias("s"))
            agg.count()
            assert "Exchange" not in _plan(agg)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS b_grp")
