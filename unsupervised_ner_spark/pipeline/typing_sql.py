"""Declarative (relational) twin of the typing stage — A1/A2/A4/A5 as
DataFrame algebra instead of the in-UDF kernel.

Purpose (SURVEY.md §2.4 A1 "Equivalent DF form"): an independently-checkable
relational expression of the typing math — explode descriptors, broadcast-join
the signature dim (J1), map subtypes->groups (J2), per-descriptor softmax via
a window, weighted sum per (mention, side, group), normalize per side, pool
CI+CS (A4/J3), argmax with deterministic tie-breaks (A5). The production
path (pipeline/tagging.py) computes the same result mention-locally with
ZERO shuffles; this variant shuffles on mention_key and exists for (a) the
DuckDB oracle gate and (b) plan-level demonstration that every step is
Catalyst-visible.

Tie-break policy: (score DESC, group ASC) — deterministic across engines.
The kernel breaks ties by insertion order instead; tests verify the two
agree on all fixture corpora (ties are measure-zero with exp-weighted sums).

Quantization: pooled scores are rounded to 9 dp before argmax so 1-ulp
libm differences between engines can't flip the winner.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from unsupervised_ner_spark.descriptors import OOV_DESCS

FIXTURES = Path(__file__).resolve().parents[1] / "resources" / "fixtures"

SUPPRESSED = ("OTHER", "UNTAGGED_ENTITY")


def _oov_lit():
    return F.array(
        *[
            F.struct(F.lit(d).alias("desc"), F.lit(s).alias("score"))
            for d, s in OOV_DESCS
        ]
    )


def load_fixture_tables(spark: SparkSession, model: str = "a100"):
    fix = spark.read.parquet(str(FIXTURES / f"descriptor_fixture_{model}.parquet"))
    sig = spark.read.parquet(str(FIXTURES / f"entity_signatures_{model}.parquet"))
    emap = spark.read.parquet(str(FIXTURES / "entity_map.parquet"))
    return fix, sig, emap


def typed_mentions_relational(
    mentions: DataFrame,
    sentences: DataFrame,
    spark: SparkSession,
    model: str = "a100",
    include_dist: bool = False,
) -> DataFrame:
    """mentions(url, sent_idx, mention_idx, begin_tok, end_tok, surface) +
    sentences(url, sent_idx, sent) -> (url, sent_idx, mention_idx, begin_tok,
    end_tok, surface, pred_group, prediction)."""
    fix, sig, emap = load_fixture_tables(spark, model)

    surf_toks = F.split(F.col("surface"), " ")
    head = F.lower(F.element_at(surf_toks, -1))
    is_num = F.forall(surf_toks, lambda t: t.rlike("^[0-9]+$"))
    blank = F.col("sent").endswith(" :__entity__")

    m = (
        mentions.join(sentences.select("url", "sent_idx", "sent"), ["url", "sent_idx"])
        .withColumn("head", head)
        .withColumn("is_num", is_num)
        .withColumn("blank", blank)
        .withColumn(
            "mkey",
            F.concat_ws("#", "url", F.col("sent_idx").cast("string"), F.col("mention_idx").cast("string")),
        )
    )

    numeric = m.filter("is_num").select(
        "url", "sent_idx", "mention_idx", "begin_tok", "end_tok", "surface",
        F.lit("MEASURE").alias("pred_group"),
        F.lit("MEASURE[NUMBER]").alias("prediction"),
    )

    mm = m.filter(~F.col("is_num"))
    # J-fixture: descriptor lookup; OOV fallback literal
    j = mm.join(F.broadcast(fix), mm["head"] == fix["term"], "left")
    sides = j.select(
        "mkey", "blank",
        F.explode(
            F.array(
                F.struct(F.lit("ci").alias("side"), F.coalesce("ci_descs", _oov_lit()).alias("descs")),
                F.struct(F.lit("cs").alias("side"), F.coalesce("cs_descs", _oov_lit()).alias("descs")),
            )
        ).alias("sd"),
    ).select("mkey", "blank", F.col("sd.side").alias("side"), F.col("sd.descs").alias("descs"))
    # blank-probe CI skip (batched_main_NER.py:158-173)
    sides = sides.filter(~(F.col("blank") & (F.col("side") == "ci")))

    drows = sides.select(
        "mkey", "side", F.posexplode("descs").alias("rank", "d")
    ).select("mkey", "side", "rank", F.lower(F.col("d.desc")).alias("desc"), F.col("d.score").alias("score"))

    # J1 signature join; miss -> UNTAGGED_ENTITY count 1
    sj = drows.join(F.broadcast(sig), drows["desc"] == sig["term"], "left").select(
        "mkey", "side", "rank", "score",
        F.coalesce("labels", F.array(F.lit("UNTAGGED_ENTITY"))).alias("labels"),
        F.coalesce("counts", F.array(F.lit(1).cast("int"))).alias("counts"),
    )
    # suppression BEFORE softmax (map_entities, batched_main_NER.py:686-702),
    # then the per-descriptor softmax (batched_main_NER.py:621, max-
    # subtracted) computed AT ARRAY LEVEL — no window, stays narrow; the
    # first exchange in this plan is the per-mention aggregate below.
    kept = F.filter(
        F.arrays_zip("labels", "counts"),
        lambda lc: ~lc["labels"].isin(*SUPPRESSED),
    )
    cnts = F.transform(kept, lambda lc: lc["counts"].cast("double"))
    mx = F.array_max(cnts)
    exps = F.transform(cnts, lambda c: F.exp(c - mx))
    tot = F.aggregate(exps, F.lit(0.0), lambda a, v: a + v)
    softp = F.zip_with(
        kept, exps,
        lambda lc, e: F.struct(
            lc["labels"].alias("label"),
            lc["counts"].cast("double").alias("cnt"),
            (e / tot).alias("soft"),
        ),
    )
    lab = sj.select(
        "mkey", "side", "score", F.explode(softp).alias("ls")
    ).select(
        "mkey", "side", "score",
        F.col("ls.label").alias("label"),
        F.col("ls.cnt").alias("cnt"),
        (F.col("ls.soft") * F.col("score")).alias("contrib"),
    )
    # J2 subtype -> group
    lab = lab.join(F.broadcast(emap), lab.label == emap.subtype).drop("subtype")

    # single wide->narrow aggregate; everything downstream is tiny
    g1 = lab.groupBy("mkey", "side", "grp", "label").agg(
        F.sum("contrib").alias("sc"), F.sum("cnt").alias("c")
    )

    # A1: sum per (mention, side, group)
    side_grp = g1.groupBy("mkey", "side", "grp").agg(F.sum("sc").alias("s"))
    wside = Window.partitionBy("mkey", "side")
    side_grp = side_grp.withColumn("conf", F.col("s") / F.sum("s").over(wside))

    # side fallback: a side with no surviving labels contributes OTHER conf 1
    all_sides = sides.select("mkey", "side").distinct()
    missing = all_sides.join(side_grp.select("mkey", "side").distinct(), ["mkey", "side"], "left_anti")
    fallback = missing.select("mkey", "side", F.lit("OTHER").alias("grp"), F.lit(1.0).alias("s"), F.lit(1.0).alias("conf"))
    side_grp = side_grp.unionByName(fallback)

    # A4 pooling: sum side-normalized confidences per group
    pooled = side_grp.groupBy("mkey", "grp").agg(F.round(F.sum("conf"), 9).alias("p"))
    wtop = Window.partitionBy("mkey").orderBy(F.desc("p"), F.asc("grp"))
    top = pooled.withColumn("rn", F.row_number().over(wtop)).filter("rn = 1").select(
        "mkey", F.col("grp").alias("pred_group")
    )

    # A2 subtype: raw counts summed across surviving sides, per (mention, grp, label)
    subs = g1.groupBy("mkey", "grp", "label").agg(F.sum("c").alias("c"))
    wsub = Window.partitionBy("mkey", "grp").orderBy(F.desc("c"), F.asc("label"))
    top_sub = subs.withColumn("rn", F.row_number().over(wsub)).filter("rn = 1").select(
        "mkey", F.col("grp").alias("sgrp"), F.col("label").alias("top_subtype")
    )

    typed = top.join(
        top_sub, (top.mkey == top_sub.mkey) & (top.pred_group == top_sub.sgrp), "left"
    ).select(top.mkey, "pred_group", "top_subtype")
    pred = F.when(
        F.col("top_subtype").isNotNull() & (F.col("top_subtype") != F.col("pred_group")),
        F.concat("pred_group", F.lit("["), "top_subtype", F.lit("]")),
    ).otherwise(F.col("pred_group"))
    typed = typed.select("mkey", "pred_group", pred.alias("prediction"))

    if not include_dist:
        out = mm.join(typed, "mkey").select(
            "url", "sent_idx", "mention_idx", "begin_tok", "end_tok", "surface",
            "pred_group", "prediction",
        )
        return out.unionByName(numeric)

    # distribution extras for the ensemble (J5/O4): normalized pooled conf of
    # the winner + the above-mean prediction set
    # (get_predictions_above_threshold, ensemble/aggregate_server_json.py:204-228)
    wm = Window.partitionBy("mkey")
    pnorm = (
        pooled.withColumn("tot", F.sum("p").over(wm))
        .withColumn("n", F.count("*").over(wm))
        .withColumn("conf_norm", F.col("p") / F.col("tot"))
    )
    above = (
        pnorm.filter(F.col("conf_norm") * F.col("n") >= 1.0)
        .groupBy("mkey")
        .agg(F.sort_array(F.collect_list("grp")).alias("above_mean"))
    )
    topconf = pnorm.select(
        F.col("mkey").alias("tkey"), F.col("grp").alias("tgrp"), "conf_norm"
    )
    typed_d = (
        typed.join(above, "mkey")
        .join(
            topconf,
            (F.col("mkey") == F.col("tkey")) & (F.col("pred_group") == F.col("tgrp")),
        )
        .select(
            "mkey", "pred_group", "prediction",
            F.round("conf_norm", 9).alias("conf"), "above_mean",
        )
    )
    out = mm.join(typed_d, "mkey").select(
        "url", "sent_idx", "mention_idx", "begin_tok", "end_tok", "surface",
        "pred_group", "prediction", "conf", "above_mean",
    )
    numeric_d = numeric.select(
        "*",
        F.lit(1.0).alias("conf"),
        F.array(F.lit("MEASURE")).alias("above_mean"),
    )
    return out.unionByName(numeric_d)
