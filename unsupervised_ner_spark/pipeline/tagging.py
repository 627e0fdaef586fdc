"""Production tagging stage: sentences -> fully-typed sentences, zero shuffle.

One Arrow-batched ``mapInPandas`` applies the whole per-sentence dataflow —
span detection, CS/CI mask generation, descriptor fetch, signature join,
typing aggregation, pooling, BIO emission — exactly the reference's
``tag_sentence`` lifecycle (batched_main_NER.py:258-325) with the HTTP hop
replaced by an in-executor provider.

Scale notes (SURVEY.md §4.3):
- This is a NARROW transformation: a 1000-executor run over 10^12 pages has
  no exchange until the cross-document ER stage.
- Dimension data (descriptor fixture, signature vocab, entity map — tens of
  MB) ships once per executor via ``SparkContext.broadcast``, mirroring the
  reference's singleton model server (BatchedNerServer.py:27-29). The
  tagger is constructed once per partition, not per row.
- Swapping ``provider_factory`` to the HF BERT provider turns this same
  stage into the GPU inference stage — batch size governed by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from unsupervised_ner_spark import dims
from unsupervised_ner_spark.descriptors import FixtureDescriptorProvider
from unsupervised_ner_spark.kernel.oracle import OracleTagger

STYPE = T.StructType(
    [
        T.StructField("st", T.StringType()),
        T.StructField("factor", T.DoubleType()),
    ]
)
POOLED = T.StructType(
    [
        T.StructField("e", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("stypes", T.ArrayType(STYPE)),
    ]
)
MENTION = T.StructType(
    [
        T.StructField("begin_tok", T.IntegerType()),
        T.StructField("end_tok", T.IntegerType()),
        T.StructField("surface", T.StringType()),
        T.StructField("masked_sent", T.StringType()),
        T.StructField("ci_probe", T.StringType()),
        T.StructField("prediction", T.StringType()),
        T.StructField("pooled", T.ArrayType(POOLED)),
    ]
)
# slim variant for the hot path: Arrow conversion of deeply nested structs
# dominates the tagging stage cost, and tags/triples only need these fields
MENTION_SLIM = T.StructType(
    [
        T.StructField("begin_tok", T.IntegerType()),
        T.StructField("end_tok", T.IntegerType()),
        T.StructField("surface", T.StringType()),
        T.StructField("prediction", T.StringType()),
        T.StructField("conf", T.DoubleType()),
    ]
)
def _tagged_schema(mention_type):
    return T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("sent_idx", T.IntegerType()),
            T.StructField("sent", T.StringType()),
            T.StructField("words", T.ArrayType(T.StringType())),
            T.StructField("span_arr", T.ArrayType(T.IntegerType())),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField("mentions", T.ArrayType(mention_type)),
        ]
    )


TAGGED_SCHEMA = _tagged_schema(MENTION)
TAGGED_SCHEMA_SLIM = _tagged_schema(MENTION_SLIM)

# broadcast registry: the fixture table (~30 MB pickled) and dims ship to
# executors ONCE per SparkContext per model, not once per tag_sentences call
# (repeated broadcasts bloat driver memory and degrade long sessions)
_BC_CACHE: dict = {}
_TABLE_CACHE: dict = {}


def _get_broadcasts(spark, model: str):
    key = (id(spark.sparkContext), model)
    if key not in _BC_CACHE:
        if model not in _TABLE_CACHE:
            _TABLE_CACHE[model] = FixtureDescriptorProvider.load(model).table
        _BC_CACHE[key] = (
            spark.sparkContext.broadcast(_TABLE_CACHE[model]),
            spark.sparkContext.broadcast(
                (dims.load_entity_map(), dims.load_signatures(model))
            ),
        )
    return _BC_CACHE[key]


def tag_sentences(
    sentences: DataFrame,
    model: str = "a100",
    suppress_untagged: bool = True,
    common_descs: frozenset[str] = frozenset(),
    provider_factory: Callable[[], object] | None = None,
    detail: bool = True,
) -> DataFrame:
    """sentences(url, sent_idx, sent) -> tagged sentences (TAGGED_SCHEMA).

    ``sent`` is assumed already punct-terminated by pages_to_sentences, so
    the in-UDF tagger runs with punct_terminate=False (idempotence).
    """
    spark = sentences.sparkSession
    bc_table, bc_dims = _get_broadcasts(spark, model)
    if provider_factory is None:

        def make_provider():
            return FixtureDescriptorProvider(bc_table.value)

    else:
        make_provider = provider_factory

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        entity_map, signatures = bc_dims.value
        tagger = OracleTagger(
            make_provider(),
            entity_map,
            signatures,
            common_descs=common_descs,
            suppress_untagged=suppress_untagged,
            punct_terminate=False,
        )
        for pdf in batches:
            out = {k: [] for k in ("url", "sent_idx", "sent", "words", "span_arr", "tags", "mentions")}
            for url, sent_idx, sent in zip(pdf["url"], pdf["sent_idx"], pdf["sent"]):
                r = tagger.tag_sentence(sent)
                out["url"].append(url)
                out["sent_idx"].append(int(sent_idx))
                out["sent"].append(r.text)
                out["words"].append(r.words)
                out["span_arr"].append(r.span_arr)
                out["tags"].append(r.tags)
                if detail:
                    out["mentions"].append(
                        [
                            {
                                "begin_tok": m.begin_tok,
                                "end_tok": m.end_tok,
                                "surface": m.surface,
                                "masked_sent": m.masked_sentence,
                                "ci_probe": m.ci_probe,
                                "prediction": m.prediction,
                                "pooled": [
                                    {
                                        "e": e,
                                        "confidence": c,
                                        "stypes": [{"st": s, "factor": f} for s, f in st],
                                    }
                                    for e, c, st in m.pooled
                                ],
                            }
                            for m in r.mentions
                        ]
                    )
                else:
                    out["mentions"].append(
                        [
                            {
                                "begin_tok": m.begin_tok,
                                "end_tok": m.end_tok,
                                "surface": m.surface,
                                "prediction": m.prediction,
                                "conf": m.pooled[0][1] if m.pooled else 1.0,
                            }
                            for m in r.mentions
                        ]
                    )
            yield pd.DataFrame(out)

    schema = TAGGED_SCHEMA if detail else TAGGED_SCHEMA_SLIM
    return sentences.select("url", "sent_idx", "sent").mapInPandas(run, schema)


def tagged_to_token_tags(tagged: DataFrame) -> DataFrame:
    """Explode to the token-level BIO table (J4/W2 — no join needed because
    mention rows carry positions; narrow)."""
    from pyspark.sql import functions as F

    z = F.arrays_zip(F.col("words"), F.col("tags"))
    df = tagged.select(
        "url", "sent_idx", F.posexplode(z).alias("token_idx", "wt")
    )
    return df.select(
        "url",
        "sent_idx",
        "token_idx",
        F.col("wt.words").alias("word"),
        F.col("wt.tags").alias("tag"),
    )
