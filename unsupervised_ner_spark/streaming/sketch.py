"""Streaming incremental HyperLogLog: corpus cardinality maintained AT
INGEST. Each micro-batch's tokens update a per-(lang, bucket) register via
``applyInPandasWithState`` (state = the running max rho), so "how many
distinct tokens has this crawl seen, per language?" is answerable at any
moment without ever re-scanning history — the streaming twin of
ops/sketches.hll_registers, with which it agrees exactly (max over
occurrences is order- and batch-insensitive; the parity test proves a
two-batch streamed run reproduces the batch register table bit-for-bit).

Scale posture: state is ONE long per (group, bucket) — bounded by
#langs x 256 regardless of ingest volume — partitioned on the same key
the batch aggregate shuffles on. A hot register (every batch touches most
of them) is a single state-row update per batch, not a skew key. The
pre-aggregation inside each batch (Spark partially aggregates rows by the
group key before the state operator) means the state op sees at most
#keys rows per batch, not #tokens.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from unsupervised_ner_spark.ops.sketches import P_HEX, SUFFIX_HEX, _rho_from_suffix
from unsupervised_ner_spark.ops.textstats import tokens_ws

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("bucket", T.StringType()),
        T.StructField("r_max", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType([T.StructField("r", T.LongType())])


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    batch_max = max(int(pdf["rho"].max()) for pdf in pdfs)
    prev = state.get[0] if state.exists else 0
    new = max(prev, batch_max)
    state.update((new,))
    if new != prev:  # only emit when the register actually advanced
        yield pd.DataFrame({"lang": [key[0]], "bucket": [key[1]], "r_max": [new]})


def running_registers(docs: DataFrame) -> DataFrame:
    """Streaming docs(doc_id, lang, text) -> updated (lang, bucket, r_max)
    rows, one per register that advanced this trigger."""
    h = F.md5(F.col("tok"))
    reg = docs.select(
        "lang",
        F.explode(F.transform(tokens_ws(F.col("text")), F.lower)).alias("tok"),
    ).select(
        "lang",
        F.substring(h, 1, P_HEX).alias("bucket"),
        _rho_from_suffix(F.substring(h, P_HEX + 1, SUFFIX_HEX)).alias("rho"),
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    return reg.groupBy("lang", "bucket").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_hll_registers(
    spark: Any,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """File-source stream of documents -> running HLL registers, update
    rows appended per epoch (the stateful.py sink pattern). Register state
    survives restarts through ``checkpoint_dir``."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(src_dir)
    )
    regs = running_registers(stream)

    def sink(batch_df, epoch_id: int) -> None:
        batch_df.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(
            out_dir
        )

    return (
        regs.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def current_registers(spark: Any, out_dir: str) -> DataFrame:
    """Latest register value per (lang, bucket) from the epoch-appended
    update rows — directly consumable by ops/sketches.hll_estimate."""
    from pyspark.sql import Window

    df = spark.read.parquet(out_dir)
    w = Window.partitionBy("lang", "bucket").orderBy(
        F.desc("epoch"), F.desc("r_max")
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("lang", "bucket", "r_max")
    )
