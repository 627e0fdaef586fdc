"""Streaming LSH ingest (streaming/ingest.py): micro-batches screened
against the accumulating banded index, restart safety, and per-batch
replay idempotency. Plus the batch snapshot-diff operator."""

from pyspark.sql import functions as F

from unsupervised_ner_spark.ops import dedup

TXT_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
TXT_B = "completely different prose about geology rocks minerals and caves"
TXT_C = "maritime navigation relies on tides charts and careful observation"


def _decisions(spark, out):
    return {
        r.doc_id: r
        for r in spark.read.option("basePath", out).parquet(out).collect()
    }


def test_stream_lsh_ingest_across_restarts(spark, tmp_path):
    """Batch 2 (a separate stream run on the same checkpoint) must reject
    near-dups of content ADMITTED in batch 1 and admit genuinely new
    content; the index grows only with admitted docs."""
    from unsupervised_ner_spark.streaming.lsh_ingest import stream_lsh_ingest

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    idx = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [(1, TXT_A), (2, TXT_B), (3, TXT_A)], "doc_id long, text string"
    ).write.parquet(src)
    q = stream_lsh_ingest(spark, src, out, idx, ckpt)
    q.awaitTermination(120)
    d1 = _decisions(spark, out)
    assert d1[1].admit and d1[2].admit
    assert d1[3].dup_in_batch and d1[3].batch_rep == 1 and not d1[3].admit

    # restart: a re-crawl of admitted content + one new doc
    spark.createDataFrame(
        [(10, TXT_A), (11, TXT_C)], "doc_id long, text string"
    ).write.mode("append").parquet(src)
    q2 = stream_lsh_ingest(spark, src, out, idx, ckpt)
    q2.awaitTermination(120)
    d2 = _decisions(spark, out)
    assert d2[10].dup_of_corpus and d2[10].corpus_rep == 1 and not d2[10].admit
    assert d2[11].admit
    # index holds bands ONLY for admitted docs
    idx_docs = {
        r.doc_id for r in spark.read.option("basePath", idx).parquet(idx).collect()
    }
    assert idx_docs == {1, 2, 11}


def test_lsh_ingest_replay_idempotent(spark, tmp_path):
    """Calling the foreachBatch body twice with the SAME batch_id (what a
    crash-restart replay does) must leave decisions and index identical —
    the replay overwrites its own output and never sees its own partial
    index rows."""
    from unsupervised_ner_spark.streaming.lsh_ingest import (
        process_ingest_batch,
        read_index,
    )

    out = str(tmp_path / "out")
    idx = str(tmp_path / "index")
    b0 = spark.createDataFrame(
        [(1, TXT_A), (2, TXT_B)], "doc_id long, text string"
    )
    process_ingest_batch(b0, 0, out, idx)
    b1 = spark.createDataFrame(
        [(5, TXT_A), (6, TXT_C)], "doc_id long, text string"
    )
    process_ingest_batch(b1, 1, out, idx)
    snap_dec = sorted(map(tuple, _decisions(spark, out).values()))
    snap_idx = sorted(
        map(tuple, read_index(spark, idx).collect())
    )
    # replay batch 1
    process_ingest_batch(b1, 1, out, idx)
    assert sorted(map(tuple, _decisions(spark, out).values())) == snap_dec
    assert sorted(map(tuple, read_index(spark, idx).collect())) == snap_idx
    # and the decision itself: 5 rejected against the index, 6 admitted
    d = _decisions(spark, out)
    assert d[5].dup_of_corpus and d[5].corpus_rep == 1 and not d[5].admit
    assert d[6].admit


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "stable content here"), (2, "will change soon"), (3, "to be removed")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "  STABLE   content HERE "),  # normalization: unchanged
            (2, "has now changed"),
            (4, "brand new doc"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.status for r in dedup.snapshot_diff(old, new).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}
