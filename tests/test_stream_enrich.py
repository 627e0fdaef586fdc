"""Stream-static enrichment join (streaming/enrich.py): every micro-batch
joins a bounded static dim via broadcast — no streaming state, no stream-side
exchange — and a restart resumes at the first unprocessed file."""

from pyspark.sql import functions as F

from unsupervised_ner_spark.streaming.enrich import (
    DOCS_SCHEMA,
    enrich_with_dim,
    stream_enriched,
)


def _lang_dim(spark):
    return spark.createDataFrame(
        [("en", "germanic", True), ("de", "germanic", True), ("xx", "synthetic", False)],
        "lang string, family string, keep boolean",
    )


def test_enrich_with_dim_semantics_and_plan(spark):
    docs = spark.createDataFrame(
        [("d1", "en", "hello world"), ("d2", "zz", "unknown lang"), ("d3", "xx", "drop me")],
        DOCS_SCHEMA,
    )
    out = enrich_with_dim(docs, _lang_dim(spark))
    got = {r.doc_id: (r.family, r.keep, r.n_chars) for r in out.collect()}
    assert got == {
        "d1": ("germanic", True, 11),
        "d2": (None, False, 12),   # unknown lang survives the left join, keep coalesced False
        "d3": ("synthetic", False, 7),
    }
    # the 100 TB posture: dim broadcast, stream side never exchanged
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_stream_enriched_restart_resumes_without_reemission(spark, tmp_path):
    src = str(tmp_path / "docs_in")
    out = str(tmp_path / "enriched_out")
    ckpt = str(tmp_path / "enrich_ckpt")
    dim = _lang_dim(spark)

    batch1 = [("d1", "en", "hello world"), ("d2", "zz", "mystery")]
    spark.createDataFrame(batch1, DOCS_SCHEMA).write.parquet(src)
    q = stream_enriched(spark, src, dim, out, ckpt)
    q.awaitTermination(120)
    rows1 = spark.read.parquet(out).collect()
    assert {r.doc_id for r in rows1} == {"d1", "d2"}
    assert {r.doc_id: r.family for r in rows1}["d1"] == "germanic"

    # restart with one new file: only the new rows are appended (the
    # checkpoint carries source progress; the stateless join re-emits nothing)
    batch2 = [("d3", "de", "neue seite")]
    spark.createDataFrame(batch2, DOCS_SCHEMA).write.mode("append").parquet(src)
    q2 = stream_enriched(spark, src, dim, out, ckpt)
    q2.awaitTermination(120)
    rows2 = spark.read.parquet(out).collect()
    assert len(rows2) == 3  # d1/d2 exactly once, d3 appended
    assert {r.doc_id for r in rows2} == {"d1", "d2", "d3"}
