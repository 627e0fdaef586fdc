"""Stream-static enrichment join — the third streaming-join primitive the
surface covers (alongside stateful.py's custom state and windowed.py's
watermarked aggregation): every micro-batch of the document stream joins
against a STATIC dimension (language metadata, source reputation, the
bootstrapped entity-signature dims) without any streaming state at all.

Semantics: the static side is re-read per micro-batch plan but is bounded
(a dim), so Spark plans a broadcast hash join batch after batch — the
stream side never shuffles. That is exactly the 100 TB posture for
enrichment: a 10^12-page stream joined to a 10^2..10^6-row dim must not
exchange the stream. No watermark is needed — a left join against a
static side cannot produce late or retracted rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def enrich_with_dim(docs: DataFrame, lang_dim: DataFrame) -> DataFrame:
    """docs(doc_id, lang, text) x static lang_dim(lang, family, keep) ->
    enriched rows; unknown langs survive with nulls (left join), and the
    ``keep`` policy column gates a downstream filter WITHOUT dropping the
    audit trail here."""
    return docs.join(F.broadcast(lang_dim), "lang", "left").select(
        "doc_id", "lang",
        F.col("family"),
        F.coalesce(F.col("keep"), F.lit(False)).alias("keep"),
        F.length("text").cast("long").alias("n_chars"),
    )


def stream_enriched(
    spark: SparkSession,
    src_dir: str,
    lang_dim: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """File-source incarnation: parquet stream in, enriched rows appended
    to parquet out. The checkpoint carries source progress only (the join
    is stateless), so a restart resumes at the first unprocessed file and
    re-emits nothing."""
    docs = spark.readStream.schema(DOCS_SCHEMA).parquet(src_dir)
    enriched = enrich_with_dim(docs, lang_dim)
    return (
        enriched.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
