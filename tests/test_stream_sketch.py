"""Streaming incremental HLL (streaming/sketch.py): a two-batch streamed
run with a restart reproduces the batch register table bit-for-bit, and
the estimate helper consumes the streamed registers directly."""

from pyspark.sql import functions as F

from unsupervised_ner_spark.ops import sketches
from unsupervised_ner_spark.ops.textstats import tokens_ws
from unsupervised_ner_spark.streaming.sketch import (
    DOCS_SCHEMA,
    current_registers,
    stream_hll_registers,
)


def _batch_registers(spark, docs_rows):
    df = spark.createDataFrame(docs_rows, DOCS_SCHEMA)
    toks = df.select(
        "lang",
        F.explode(F.transform(tokens_ws(F.col("text")), F.lower)).alias("tok"),
    )
    return sketches.hll_registers(toks, ["lang"], "tok")


def test_streamed_registers_match_batch_across_restart(spark, tmp_path):
    src = str(tmp_path / "docs_in")
    out = str(tmp_path / "regs_out")
    ckpt = str(tmp_path / "regs_ckpt")
    batch1 = [
        ("d1", "en", "alpha beta gamma delta"),
        ("d2", "en", "alpha epsilon zeta"),
        ("d3", "de", "eins zwei drei"),
    ]
    spark.createDataFrame(batch1, DOCS_SCHEMA).write.parquet(src)
    q = stream_hll_registers(spark, src, out, ckpt)
    q.awaitTermination(120)
    got1 = {tuple(r) for r in current_registers(spark, out).collect()}
    want1 = {tuple(r) for r in _batch_registers(spark, batch1).collect()}
    assert got1 == want1

    # restart with new docs (some repeating old tokens — registers must
    # only ever advance, never regress or duplicate)
    batch2 = [
        ("d4", "en", "alpha omega psi chi phi upsilon tau"),
        ("d5", "de", "zwei vier"),
    ]
    spark.createDataFrame(batch2, DOCS_SCHEMA).write.mode("append").parquet(src)
    q2 = stream_hll_registers(spark, src, out, ckpt)
    q2.awaitTermination(120)
    got2 = {tuple(r) for r in current_registers(spark, out).collect()}
    want2 = {tuple(r) for r in _batch_registers(spark, batch1 + batch2).collect()}
    assert got2 == want2

    # the streamed register table feeds the estimator directly
    est = {
        r.lang: r.estimate
        for r in sketches.hll_estimate(
            current_registers(spark, out), ["lang"]
        ).collect()
    }
    n_en = 11  # distinct en tokens across both batches
    assert abs(est["en"] - n_en) / n_en < 0.5  # tiny-n sanity, not precision
