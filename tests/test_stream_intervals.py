"""Streaming SCD2 fact-interval maintenance (streaming/intervals.py):
closed-interval emission, open-run state across RESTARTS, and equivalence
of the closed prefix with the batch gaps-and-islands operator."""

from pyspark.sql import functions as F


def _rows(spark, out):
    try:
        return [
            tuple(r)
            for r in spark.read.option("basePath", out).parquet(out).collect()
        ]
    except Exception:
        return []


def test_stream_intervals_close_across_restarts(spark, tmp_path):
    from unsupervised_ner_spark.streaming.intervals import stream_fact_intervals

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: fact A days 0,1,1,2 (open run); fact B day 5 (open run)
    spark.createDataFrame(
        [("A", 0), ("A", 1), ("A", 1), ("A", 2), ("B", 5)],
        "fact_key string, day long",
    ).write.parquet(src)
    q = stream_fact_intervals(spark, src, out, ckpt)
    q.awaitTermination(120)
    assert _rows(spark, out) == []  # nothing closed yet

    # restart: A jumps to day 20 (closes [0,2] with 4 obs, opens [20]);
    # B day 6 extends its open run (gap 1 <= 7, nothing emitted)
    spark.createDataFrame(
        [("A", 20), ("B", 6)], "fact_key string, day long"
    ).write.mode("append").parquet(src)
    q2 = stream_fact_intervals(spark, src, out, ckpt)
    q2.awaitTermination(120)
    assert _rows(spark, out) == [("A", 0, 2, 4)]

    # third run: A day 40 closes [20,20]; B day 30 closes [5,6] with 2 obs
    spark.createDataFrame(
        [("A", 40), ("B", 30)], "fact_key string, day long"
    ).write.mode("append").parquet(src)
    q3 = stream_fact_intervals(spark, src, out, ckpt)
    q3.awaitTermination(120)
    assert sorted(_rows(spark, out)) == [
        ("A", 0, 2, 4), ("A", 20, 20, 1), ("B", 5, 6, 2),
    ]


def test_stream_intervals_match_batch_closed_prefix(spark, tmp_path):
    """Feeding the whole observation history through the stream must emit
    exactly the batch operator's intervals MINUS each fact's final (still
    open) one."""
    from unsupervised_ner_spark.pipeline.triples import fact_intervals
    from unsupervised_ner_spark.streaming.intervals import stream_fact_intervals

    obs = [
        ("s|A|p|o|B", d) for d in (0, 1, 2, 20, 21, 40)
    ] + [("s2|A|q|o2|B", 5)]
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(obs, "fact_key string, day long").write.parquet(src)
    q = stream_fact_intervals(spark, src, out, ckpt)
    q.awaitTermination(120)
    streamed = sorted(_rows(spark, out))

    batch_in = spark.createDataFrame(
        [(k, d * 86400) for k, d in obs],
        "fact_key string, obs_ts long",
    ).select(
        F.split("fact_key", r"\|")[0].alias("subj"),
        F.split("fact_key", r"\|")[1].alias("subj_type"),
        F.split("fact_key", r"\|")[2].alias("pred_norm"),
        F.split("fact_key", r"\|")[3].alias("obj"),
        F.split("fact_key", r"\|")[4].alias("obj_type"),
        "obs_ts",
    )
    b = fact_intervals(batch_in, gap_days=7)
    # drop each fact's final interval (still open in the stream)
    from pyspark.sql import Window

    w = Window.partitionBy("subj", "pred_norm", "obj").orderBy(
        F.desc("interval_idx")
    )
    closed = (
        b.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .select(
            F.concat_ws(
                "|", "subj", "subj_type", "pred_norm", "obj", "obj_type"
            ).alias("fact_key"),
            "valid_from_day", "valid_to_day", "n_obs",
        )
    )
    expected = sorted(tuple(r) for r in closed.collect())
    assert streamed == expected
