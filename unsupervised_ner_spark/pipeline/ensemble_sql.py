"""Declarative (relational) twin of the two-model ensemble — J5/J6/O4 as
pure column algebra over TWO relational typing runs, hash-stable across
engines (quantized confidences, sorted above-mean sets, deterministic
CASE order). Semantics follow pipeline/ensemble.py (which cites
ensemble/aggregate_server_json.py rule-by-rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unsupervised_ner_spark import dims
from unsupervised_ner_spark.pipeline.typing_sql import typed_mentions_relational


def ensemble_mentions_relational(
    mentions: DataFrame,
    sentences: DataFrame,
    spark: SparkSession,
    model_a: str = "a100",
    model_b: str = "bbc",
) -> DataFrame:
    ta = typed_mentions_relational(mentions, sentences, spark, model_a, include_dist=True)
    tb = typed_mentions_relational(mentions, sentences, spark, model_b, include_dist=True)
    a = ta.select(
        "url", "sent_idx", "mention_idx", "surface",
        F.col("pred_group").alias("base_a"),
        F.col("prediction").alias("pred_a"),
        F.col("conf").alias("conf_a"),
        F.col("above_mean").alias("above_a"),
    )
    b = tb.select(
        "url", "sent_idx", "mention_idx",
        F.col("pred_group").alias("base_b"),
        F.col("prediction").alias("pred_b"),
        F.col("conf").alias("conf_b"),
        F.col("above_mean").alias("above_b"),
    )
    prec = dims.load_precedence()
    bio_ok = F.array(*[F.lit(x) for x in prec["bio_precedence_arr"] + prec["common_entities_arr"]])
    phi_ok = F.array(*[F.lit(x) for x in prec["phi_precedence_arr"] + prec["common_entities_arr"]])
    bio_prec = F.array(*[F.lit(x) for x in prec["bio_precedence_arr"]])

    j = a.join(b, ["url", "sent_idx", "mention_idx"])
    cross_a = F.exists(F.col("above_a"), lambda e: ~F.array_contains(bio_ok, e))
    cross_b = F.exists(F.col("above_b"), lambda e: ~F.array_contains(phi_ok, e))
    dual = F.when(
        F.col("conf_a") >= F.col("conf_b"),
        F.concat("pred_a", F.lit("/"), "pred_b"),
    ).otherwise(F.concat("pred_b", F.lit("/"), "pred_a"))
    resolution = (
        F.when(
            F.col("base_a") == F.col("base_b"),
            F.when(F.array_contains(bio_prec, F.col("base_a")), F.col("pred_a")).otherwise(F.col("pred_b")),
        )
        .when(F.col("base_b") == "OTHER", F.col("pred_a"))
        .when(F.col("base_a") == "OTHER", F.col("pred_b"))
        .when(cross_a & ~cross_b, F.col("pred_b"))
        .when(cross_b & ~cross_a, F.col("pred_a"))
        .otherwise(dual)
    )
    return j.select(
        "url", "sent_idx", "mention_idx", "surface",
        "pred_a", "pred_b", resolution.alias("resolution"),
    )
