"""Tests for bootstrap-vocabulary ops (S10/A7/A8/A9/W4) and streaming
incremental ingest."""

import pytest
from pyspark.sql import functions as F

from unsupervised_ner_spark.ops import bootstrap as B
from unsupervised_ner_spark.pipeline.runner import run_pipeline
from unsupervised_ner_spark.pipeline.synth import synth_pages
from unsupervised_ner_spark.pipeline.tagging import tag_sentences


def test_merge_label_files_semantics(spark):
    # construct_bs.py: lowercase, dedupe, UNTAGGED stripped when others exist
    f1 = spark.createDataFrame(
        [("Aspirin", "DRUG"), ("bone", "UNTAGGED_ENTITY")], "term string, label string"
    )
    f2 = spark.createDataFrame(
        [("aspirin", "CHEMICAL_SUBSTANCE"), ("bone", "DISEASE"), ("solo", "UNTAGGED_ENTITY")],
        "term string, label string",
    )
    out = {r.term: r.labels for r in B.merge_label_files([f1, f2]).collect()}
    assert out["aspirin"] == ["DRUG", "CHEMICAL_SUBSTANCE"]
    assert out["bone"] == ["DISEASE"]          # UNTAGGED stripped
    assert out["solo"] == ["UNTAGGED_ENTITY"]  # kept when alone


def test_label_histogram(spark):
    df = spark.createDataFrame(
        [("a", "X"), ("b", "X"), ("c", "Y")], "term string, label string"
    )
    rows = B.label_histogram(df).collect()
    assert [(r.label, r.n) for r in rows] == [("X", 2), ("Y", 1)]


def test_dedupe_lines_first_occurrence(spark):
    df = spark.createDataFrame([("x",), ("y",), ("x",)], "line string")
    assert B.dedupe_lines(df).count() == 2


def test_harvest_ci_candidates(spark):
    sents = spark.createDataFrame(
        [
            ("u1", 0, "Mesothelioma :__entity__"),
            ("u1", 1, "Mesothelioma:__entity__ is a disease ."),
        ],
        "url string, sent_idx int, sent string",
    )
    tagged = tag_sentences(sents, detail=True)
    got = B.harvest_ci_candidates(tagged).collect()
    # only the blank-probe sentence harvests
    assert len(got) == 1
    assert got[0].surface == "Mesothelioma"
    assert got[0].harvested_label == "DISEASE"


def test_streaming_incremental_ingest(spark, tmp_path):
    from unsupervised_ner_spark.pipeline import checkpoint as cp
    from unsupervised_ner_spark.streaming import stream_pages

    src = str(tmp_path / "pages_in")
    out = str(tmp_path / "out")
    synth_pages(spark, 20).write.parquet(src)
    q = stream_pages(spark, src, out, lang_filter=None)
    q.awaitTermination(120)
    tags = spark.read.parquet(f"{out}/tags")
    assert tags.count() > 0
    # second batch of new files -> only new data appended
    n1 = tags.count()
    synth_pages(spark, 40).filter("pmod(xxhash64(url), 2) = 0").write.mode(
        "append"
    ).parquet(src)
    q2 = stream_pages(spark, src, out, lang_filter=None)
    q2.awaitTermination(120)
    n2 = spark.read.parquet(f"{out}/tags").count()
    assert n2 > n1
    m = cp.stage_metrics(spark, out)
    assert m.filter(F.col("stage") == "tags").count() > 0


def test_stateful_entity_counts_accumulate_across_restarts(spark, tmp_path):
    """applyInPandasWithState running counts: operator state persists through
    the checkpoint across two availableNow runs (SURVEY §2.10 engine extra)."""
    from unsupervised_ner_spark.streaming.stateful import (
        current_counts,
        stream_entity_counts,
    )

    src = str(tmp_path / "mentions_in")
    out = str(tmp_path / "counts_out")
    ckpt = str(tmp_path / "state_ckpt")
    rows1 = [("u1", "DISEASE", "mesothelioma"), ("u2", "DISEASE", "mesothelioma"),
             ("u3", "PERSON", "john doe")]
    spark.createDataFrame(rows1, "url string, etype string, norm_surface string") \
        .write.parquet(src)
    q = stream_entity_counts(spark, src, out, ckpt)
    q.awaitTermination(120)
    got1 = {(r.etype, r.norm_surface): r.n_mentions
            for r in current_counts(spark, out).collect()}
    assert got1[("DISEASE", "mesothelioma")] == 2
    assert got1[("PERSON", "john doe")] == 1
    # second batch of files; restart resumes state from the checkpoint
    rows2 = [("u4", "DISEASE", "mesothelioma"), ("u5", "LOCATION", "paris")]
    spark.createDataFrame(rows2, "url string, etype string, norm_surface string") \
        .write.mode("append").parquet(src)
    q2 = stream_entity_counts(spark, src, out, ckpt)
    q2.awaitTermination(120)
    got2 = {(r.etype, r.norm_surface): r.n_mentions
            for r in current_counts(spark, out).collect()}
    assert got2[("DISEASE", "mesothelioma")] == 3  # 2 + 1, via persisted state
    assert got2[("LOCATION", "paris")] == 1
    assert got2[("PERSON", "john doe")] == 1  # untouched keys keep their total


def test_windowed_counts_watermark_and_late_drop(spark, tmp_path):
    """Watermarked event-time windows (streaming/windowed.py): append mode
    emits a window exactly once after the watermark passes its end; a row
    later than the watermark for a closed window is dropped, not merged;
    the watermark itself survives a restart through the checkpoint."""
    from datetime import datetime

    from unsupervised_ner_spark.streaming.windowed import (
        DOCS_SCHEMA,
        stream_windowed_counts,
    )

    def ts(h, m):
        return datetime(2026, 1, 1, h, m)

    src = str(tmp_path / "docs_in")
    out = str(tmp_path / "win_out")
    ckpt = str(tmp_path / "win_ckpt")
    # window A = [00:00, 00:10): three en docs; the 03:00 horizon doc moves
    # the watermark to 02:30 at end of run 1, closing (and emitting) A
    batch1 = [
        ("d1", "en", ts(0, 1)), ("d2", "en", ts(0, 4)), ("d3", "en", ts(0, 8)),
        ("h1", "de", ts(3, 0)),
    ]
    spark.createDataFrame(batch1, DOCS_SCHEMA).write.parquet(src)
    q = stream_windowed_counts(spark, src, out, ckpt)
    q.awaitTermination(120)
    got1 = {(r.win_start, r.lang): r.n_docs for r in spark.read.parquet(out).collect()}
    assert got1 == {(ts(0, 0), "en"): 3}, got1
    # restart: a LATE en doc at 00:02 (behind the persisted 02:30
    # watermark — dropped) plus a 04:00 doc that pushes the watermark to
    # 03:30, closing the horizon window [03:00, 03:10)
    batch2 = [("late", "en", ts(0, 2)), ("h2", "fr", ts(4, 0))]
    spark.createDataFrame(batch2, DOCS_SCHEMA).write.mode("append").parquet(src)
    q2 = stream_windowed_counts(spark, src, out, ckpt)
    q2.awaitTermination(120)
    got2 = {(r.win_start, r.lang): r.n_docs for r in spark.read.parquet(out).collect()}
    assert got2 == {
        (ts(0, 0), "en"): 3,   # closed window NOT re-emitted or grown by the late row
        (ts(3, 0), "de"): 1,   # horizon window finalized by the new watermark
    }, got2


def test_streaming_first_seen_dedup_across_restarts(spark, tmp_path):
    """Streaming exact dedup: one survivor per fingerprint for the stream's
    LIFETIME — a restart must not re-admit content seen before the
    interruption (state via checkpointLocation)."""
    from unsupervised_ner_spark.streaming.stateful import stream_first_seen

    src = str(tmp_path / "docs_in")
    out = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "dedup_ckpt")
    batch1 = [(3, "shared body text"), (1, "shared body text"),
              (5, "unique first text")]
    spark.createDataFrame(batch1, "doc_id long, text string").write.parquet(src)
    q = stream_first_seen(spark, src, out, ckpt)
    q.awaitTermination(120)
    got1 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got1 == {1, 5}  # min doc_id wins within the admitting batch

    # restart with a re-crawl of seen content + one new doc
    batch2 = [(9, "shared body text"), (2, "unique first text"),
              (7, "brand new text")]
    spark.createDataFrame(batch2, "doc_id long, text string") \
        .write.mode("append").parquet(src)
    q2 = stream_first_seen(spark, src, out, ckpt)
    q2.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    got2 = {r.doc_id for r in rows}
    assert got2 == {1, 5, 7}  # nothing seen re-admitted, new doc admitted
    assert len(rows) == 3  # and no duplicate output rows either
