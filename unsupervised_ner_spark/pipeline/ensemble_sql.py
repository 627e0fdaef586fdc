"""Declarative (relational) twin of the two-model ensemble — J5/J6/O4 as
pure column algebra over TWO relational typing runs, hash-stable across
engines (9dp-quantized confidences, deterministically sorted packed
distributions, deterministic CASE order). The resolution maze itself is
the shared Column implementation in ``pipeline/ensemble_rules.py`` (which
cites ensemble/aggregate_server_json.py branch-by-branch); this module only
wires the relational typing outputs into it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unsupervised_ner_spark import dims
from unsupervised_ner_spark.caching import scoped_persist
from unsupervised_ner_spark.pipeline import ensemble_rules as R
from unsupervised_ner_spark.pipeline.typing_sql import (
    mention_scaffold,
    typed_mentions_relational,
)


def ensemble_mentions_relational(
    mentions: DataFrame,
    sentences: DataFrame,
    spark: SparkSession,
    model_a: str = "a100",
    model_b: str = "bbc",
) -> DataFrame:
    # both model chains consume the same mention/sentence scaffold — build
    # the model-independent scaffold ONCE and materialize it (lazy
    # localCheckpoint: raw blocks, no columnar encode — measured in
    # caching.scoped_persist) so the window-heavy mention detection runs
    # once, not once per model. Round-6: the scaffold is checkpointed
    # directly (it subsumes the former separate mentions/sentences
    # checkpoints — nothing else consumes those inputs), which removes two
    # checkpoint plannings/materializations and one scaffold join per run.
    scaffold = scoped_persist(
        mention_scaffold(mentions, sentences), how="checkpoint", tunable=True
    )
    ta = typed_mentions_relational(
        mentions, sentences, spark, model_a, include_dist=True, scaffold=scaffold
    )
    tb = typed_mentions_relational(
        mentions, sentences, spark, model_b, include_dist=True, scaffold=scaffold
    )
    a = ta.select(
        "url", "sent_idx", "mention_idx", "surface",
        F.col("prediction").alias("pred_a"),
        F.col("conf").alias("conf_a"),
        F.col("cs_dist").alias("cs_a"),
        F.col("ci_dist").alias("ci_a"),
    )
    b = tb.select(
        "url", "sent_idx", "mention_idx",
        F.col("prediction").alias("pred_b"),
        F.col("conf").alias("conf_b"),
        F.col("cs_dist").alias("cs_b"),
        F.col("ci_dist").alias("ci_b"),
    )
    prec = dims.load_precedence()
    bio = prec["bio_precedence_arr"]
    phi = prec["phi_precedence_arr"]
    common = prec["common_entities_arr"]
    lit_arr = lambda xs: F.array(*[F.lit(x) for x in xs])  # noqa: E731

    j = a.join(b, ["url", "sent_idx", "mention_idx"])
    resolution = R.resolve_expr(
        F.col("pred_a"), F.col("conf_a"), F.col("cs_a"), F.col("ci_a"),
        F.col("pred_b"), F.col("conf_b"), F.col("cs_b"), F.col("ci_b"),
        bio_prec=lit_arr(bio), bio_ok=lit_arr(bio + common),
        phi_prec=lit_arr(phi), phi_ok=lit_arr(phi + common),
    )
    return j.select(
        "url", "sent_idx", "mention_idx", "surface",
        "pred_a", "pred_b", resolution.alias("resolution"),
    )
