"""Streaming incremental KG construction (streaming/kg_ingest.py):
per-batch triple-support partitions must merge to EXACTLY the single-shot
batch table (the url-disjoint additivity contract), survive a restart,
and replay idempotently."""

from unsupervised_ner_spark.streaming.kg_ingest import (
    batch_triple_support,
    process_kg_batch,
    read_support,
    stream_kg_ingest,
)

# canned-corpus sentences that the fixture typing chain resolves to typed
# mentions (and therefore triples)
D1 = "Mesothelioma is caused by exposure to asbestos\nPaul Erdos died at 83"
D2 = "Imatinib mesylate is a drug and is used to treat nsclc"
D3 = "Lou Gehrig who works in XCorp suffers from Parkinsons"
D4 = "Fyodor Mikhailovich Dostoevsky was treated for Parkinsons"
D5 = "In humans mutations in Foxp2 leads to verbal dyspraxia"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _snap(spark, support_dir):
    return sorted(map(tuple, read_support(spark, support_dir).collect()))


def test_stream_kg_ingest_across_restarts_merges_to_batch_truth(spark, tmp_path):
    src = str(tmp_path / "in")
    sup = str(tmp_path / "support")
    ckpt = str(tmp_path / "ckpt")

    first = [(1, D1), (2, D2), (3, D3)]
    _docs(spark, first).write.parquet(src)
    q = stream_kg_ingest(spark, src, sup, ckpt)
    q.awaitTermination(180)

    # restart with two more pages on the same checkpoint
    later = [(4, D4), (5, D5)]
    _docs(spark, later).write.mode("append").parquet(src)
    q2 = stream_kg_ingest(spark, src, sup, ckpt)
    q2.awaitTermination(180)

    merged = _snap(spark, sup)
    assert merged, "stream produced no KG edges — fixture chain broken"
    want = sorted(
        map(tuple, batch_triple_support(_docs(spark, first + later)).collect())
    )
    assert merged == want


def test_kg_ingest_replay_idempotent(spark, tmp_path):
    sup = str(tmp_path / "support")
    b0 = _docs(spark, [(1, D1), (2, D2)])
    b1 = _docs(spark, [(7, D3), (8, D1)])  # D1 repeats on a NEW url
    process_kg_batch(b0, 0, sup)
    process_kg_batch(b1, 1, sup)
    snap = _snap(spark, sup)
    process_kg_batch(b1, 1, sup)  # crash-restart replay of batch 1
    assert _snap(spark, sup) == snap
    # the repeated content shows up as cross-page support, not a dup edge
    merged = read_support(spark, sup)
    assert merged.count() == batch_triple_support(
        _docs(spark, [(1, D1), (2, D2), (7, D3), (8, D1)])
    ).count()
    two_pages = merged.filter("n_docs >= 2").count()
    assert two_pages > 0  # D1's edges seen on urls 1 and 8


def test_read_support_empty_safe(spark, tmp_path):
    assert read_support(spark, str(tmp_path / "nope")).count() == 0
