"""Declarative (relational) twin of the typing stage — A1/A2/A4/A5 as
DataFrame algebra instead of the in-UDF kernel.

Purpose (SURVEY.md §2.4 A1 "Equivalent DF form"): an independently-checkable
relational expression of the typing math — explode descriptors, broadcast-join
the signature dim (J1), map subtypes->groups (J2), per-descriptor softmax via
array algebra, weighted sum per (mention, side, group), normalize per side,
pool CI+CS (A4/J3), argmax with deterministic tie-breaks (A5). The production
path (pipeline/tagging.py) computes the same result mention-locally with
ZERO shuffles; this variant shuffles on mention_key and exists for (a) the
DuckDB oracle gate and (b) plan-level demonstration that every step is
Catalyst-visible.

Blank-probe semantics (batched_main_NER.py:158-173): the CI side is COMPUTED
for every mention (the reference's find_ci_entities runs unconditionally)
but EXCLUDED FROM POOLING for blank-probe sentences — so the per-side
distributions the ensemble consumes exist even where pooling skips CI.

Context keying for bare-marker mentions (ADVICE r01): an empty-surface
mention (":__entity__" alone) keys its CS descriptors on the word
preceding the mask (the fixture stand-in for the reference MLM predicting
the masked position from context, batched_main_NER.py:158-163) and its CI
descriptors on the empty string -> OOV (the CI probe " is a entity" has no
mask token to key from). Identical rule in the kernel provider
(descriptors.FixtureDescriptorProvider._context_key) and the DuckDB oracle.

Tie-break policy: (score DESC, group ASC) everywhere — deterministic across
engines; the kernel uses the same rule (kernel/typing.py docstring).

Quantization: pooled scores are rounded to 9 dp before argmax so 1-ulp
libm differences between engines can't flip the winner; per-side
distribution confidences are rounded to 9 dp before sorting/packing.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from unsupervised_ner_spark.caching import scoped_persist
from unsupervised_ner_spark.descriptors import OOV_DESCS
from unsupervised_ner_spark.pipeline.mentions import strip_marker, tokens_col
from unsupervised_ner_spark.respath import resources_root

FIXTURES = resources_root() / "fixtures"

SUPPRESSED = ("OTHER", "UNTAGGED_ENTITY")


def _oov_lit():
    return F.array(
        *[
            F.struct(F.lit(d).alias("desc"), F.lit(s).alias("score"))
            for d, s in OOV_DESCS
        ]
    )


_FIXTURE_READS: dict = {}


def load_fixture_tables(spark: SparkSession, model: str = "a100"):
    """Plan handles for the three fixture dimension tables. Cached per
    (session, model): each ``spark.read.parquet`` costs a driver-side
    footer/schema read (~60 ms), and the typing/ensemble queries load the
    same bundle on every call — the handles are lazy scans of package
    resources (dimension data shipped with the code), so reusing them
    caches no query results."""
    key = (spark, model)
    if key not in _FIXTURE_READS:
        fix = spark.read.parquet(str(FIXTURES / f"descriptor_fixture_{model}.parquet"))
        sig = spark.read.parquet(str(FIXTURES / f"entity_signatures_{model}.parquet"))
        emap = spark.read.parquet(str(FIXTURES / "entity_map.parquet"))
        _FIXTURE_READS[key] = (fix, sig, emap)
    return _FIXTURE_READS[key]


def mention_scaffold(mentions: DataFrame, sentences: DataFrame) -> DataFrame:
    """The model-INDEPENDENT mention scaffold: mentions joined to their
    sentence, decorated with the typing head key, blank/numeric flags and
    the mention key. Factored out (round-6) so the two-model ensemble can
    build and checkpoint it ONCE instead of once per model chain — the
    scaffold contains nothing model-specific (the first model-dependent
    step is the descriptor-fixture join)."""
    surf_toks = F.split(F.col("surface"), " ")
    surf_head = F.lower(F.element_at(surf_toks, -1))
    is_num = F.forall(surf_toks, lambda t: t.rlike("^[0-9]+$"))
    blank = F.col("sent").endswith(" :__entity__")
    # context key for bare-marker mentions: the last NON-EMPTY marker-
    # stripped word before the masked position (the kernel splits the masked
    # sentence on whitespace, so empty stripped words collapse —
    # descriptors.FixtureDescriptorProvider._context_key); sentence-initial
    # markers have none -> '' -> OOV
    stoks = F.transform(tokens_col(F.col("sent")), strip_marker)
    prev_word = F.lower(
        F.try_element_at(
            F.filter(
                F.slice(stoks, 1, F.col("begin_tok").cast("int")),
                lambda t: t != F.lit(""),
            ),
            F.lit(-1),
        )
    )
    has_surface = F.length("surface") > 0
    head_cs = F.when(has_surface, surf_head).otherwise(F.coalesce(prev_word, F.lit("")))

    # ``sent`` is dropped at the end: it exists only to derive head/blank
    # (computed here) and duplicating every sentence string per mention made
    # the round-2 cached copy several times the useful data.
    return (
        mentions.join(sentences.select("url", "sent_idx", "sent"), ["url", "sent_idx"])
        .withColumn("head", head_cs)
        .withColumn("has_surface", has_surface)
        .withColumn("is_num", is_num & has_surface)
        .withColumn("blank", blank)
        .withColumn(
            "mkey",
            F.concat_ws("#", "url", F.col("sent_idx").cast("string"), F.col("mention_idx").cast("string")),
        )
        .drop("sent")
    )


def typed_mentions_relational(
    mentions: DataFrame,
    sentences: DataFrame,
    spark: SparkSession,
    model: str = "a100",
    include_dist: bool = False,
    scaffold: DataFrame | None = None,
) -> DataFrame:
    """mentions(url, sent_idx, mention_idx, begin_tok, end_tok, surface) +
    sentences(url, sent_idx, sent) -> (url, sent_idx, mention_idx, begin_tok,
    end_tok, surface, pred_group, prediction [, conf, cs_dist, ci_dist]).

    ``scaffold``: a caller-materialized :func:`mention_scaffold` — the
    two-model ensemble passes the SAME checkpointed scaffold into both
    model chains (round-6: one scaffold build/planning/materialization
    instead of two, and the per-model mentions/sentences checkpoints
    become unnecessary)."""
    fix, sig, emap = load_fixture_tables(spark, model)

    # Materialization policy (measured, VERDICT r02 items 2-3): the mention
    # scaffold ``m`` and the wide->narrow aggregate ``g1`` each feed 2-4
    # consumers, but for the single-output path (include_dist=False)
    # recomputing the narrow column algebra is 2× CHEAPER than a columnar
    # persist (29.1 s vs 66.6 s at sf0.1) — so no persistence there. The
    # ensemble path (include_dist=True) consumes g1/m across two model
    # chains and many more aggregates; without materialization it explodes
    # (283 s vs 23.4 s) — so it takes a lazy localCheckpoint (raw block
    # write, no columnar encode; see caching.scoped_persist).
    _mat = (
        (lambda df: scoped_persist(df, how="checkpoint", tunable=True))
        if include_dist
        else (lambda df: df)
    )
    m = scaffold if scaffold is not None else _mat(mention_scaffold(mentions, sentences))

    numeric = m.filter("is_num").select(
        "url", "sent_idx", "mention_idx", "begin_tok", "end_tok", "surface",
        F.lit("MEASURE").alias("pred_group"),
        F.lit("MEASURE[NUMBER]").alias("prediction"),
    )

    mm = m.filter(~F.col("is_num"))
    # J-fixture: descriptor lookup on the (possibly context-) head; OOV
    # fallback literal. The CI side of an empty-surface mention is ALWAYS
    # OOV (its probe has no mask token to context-key from).
    j = mm.join(F.broadcast(fix), mm["head"] == fix["term"], "left")
    ci_descs = F.when(~F.col("has_surface"), _oov_lit()).otherwise(
        F.coalesce("ci_descs", _oov_lit())
    )
    cs_descs = F.coalesce("cs_descs", _oov_lit())
    sides = j.select(
        "mkey", "blank",
        F.explode(
            F.array(
                F.struct(F.lit("ci").alias("side"), ci_descs.alias("descs")),
                F.struct(F.lit("cs").alias("side"), cs_descs.alias("descs")),
            )
        ).alias("sd"),
    ).select("mkey", "blank", F.col("sd.side").alias("side"), F.col("sd.descs").alias("descs"))

    drows = sides.select(
        "mkey", "blank", "side", F.posexplode("descs").alias("rank", "d")
    ).select(
        "mkey", "blank", "side", "rank",
        F.lower(F.col("d.desc")).alias("desc"), F.col("d.score").alias("score"),
    )

    # J1 signature join; miss -> UNTAGGED_ENTITY count 1
    sj = drows.join(F.broadcast(sig), drows["desc"] == sig["term"], "left").select(
        "mkey", "blank", "side", "rank", "score",
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
        "mkey", "blank", "side", "score", F.explode(softp).alias("ls")
    ).select(
        "mkey", "blank", "side", "score",
        F.col("ls.label").alias("label"),
        F.col("ls.cnt").alias("cnt"),
        (F.col("ls.soft") * F.col("score")).alias("contrib"),
    )
    # J2 subtype -> group
    lab = lab.join(F.broadcast(emap), lab.label == emap.subtype).drop("subtype")

    # single wide->narrow aggregate; everything downstream is tiny
    # (blank is functionally dependent on mkey — a free grouping key)
    # g1 is the wide->narrow pinch point: everything upstream (descriptor
    # explode + softmax algebra) is expensive, everything downstream tiny.
    # Materialized only on the multi-consumer ensemble path (see _mat note).
    #
    # Round-6 (guide §2.4 "share one exchange"): g1 is re-keyed to
    # hashpartitioning(mkey) right after the aggregate. Every downstream
    # operator clusters on a key set CONTAINING mkey — groupBy (mkey, side,
    # grp[, label]), Window.partitionBy(mkey[, side|grp]), the mkey equi-
    # joins — and hashpartitioning(mkey) satisfies all those clustered
    # distributions, so the whole tail plans ZERO further exchanges
    # (measured: 9 -> 2 Exchange on the include_dist=False plan). The extra
    # exchange moves only the aggregated per-mention rows, and the
    # localCheckpoint on the ensemble path stores the mkey partitioning in
    # its LogicalRDD, so both model chains inherit it for free.
    g1 = _mat(
        lab.groupBy("mkey", "blank", "side", "grp", "label")
        .agg(F.sum("contrib").alias("sc"), F.sum("cnt").alias("c"))
        .repartition("mkey")
    )

    # A1: sum per (mention, side, group); normalize per side
    side_grp = g1.groupBy("mkey", "blank", "side", "grp").agg(F.sum("sc").alias("s"))
    wside = Window.partitionBy("mkey", "side")
    side_grp = side_grp.withColumn("conf", F.col("s") / F.sum("s").over(wside))

    # side fallback: a side with no surviving labels contributes OTHER conf 1.
    # Every mention has exactly the two sides {ci, cs} (the fix join is 1:1
    # — ``term`` is unique in the descriptor fixture — and ``sides`` emits
    # one row per side unconditionally), so the side universe is derived
    # from the mention scaffold directly instead of re-running the whole
    # descriptor chain through a distinct (round-6: removes one full
    # upstream recompute + a mention-sized dedup shuffle, guide §2.4).
    all_sides = mm.select(
        "mkey", "blank",
        F.explode(F.array(F.lit("ci"), F.lit("cs"))).alias("side"),
    )
    missing = all_sides.join(
        side_grp.select("mkey", "side").distinct(), ["mkey", "side"], "left_anti"
    )
    fallback = missing.select(
        "mkey", "blank", "side",
        F.lit("OTHER").alias("grp"), F.lit(1.0).alias("s"), F.lit(1.0).alias("conf"),
    )
    # the union's children carry different partitionings, which would void
    # the mkey clustering for every consumer below; one re-key of the small
    # per-(mention, side, group) table restores it (see the g1 note)
    side_grp = side_grp.unionByName(fallback).repartition("mkey")

    # A4 pooling: sum side-normalized confidences per group, SKIPPING the CI
    # side of blank-probe sentences (batched_main_NER.py:172-173)
    pool_rows = side_grp.filter(~(F.col("blank") & (F.col("side") == "ci")))
    pooled = pool_rows.groupBy("mkey", "grp").agg(F.round(F.sum("conf"), 9).alias("p"))
    wtop = Window.partitionBy("mkey").orderBy(F.desc("p"), F.asc("grp"))
    top = pooled.withColumn("rn", F.row_number().over(wtop)).filter("rn = 1").select(
        "mkey", F.col("grp").alias("pred_group")
    )

    # A2 subtype: raw counts summed across POOLED sides, per (mention, grp, label)
    subs = (
        g1.filter(~(F.col("blank") & (F.col("side") == "ci")))
        .groupBy("mkey", "grp", "label").agg(F.sum("c").alias("c"))
    )
    wsub = Window.partitionBy("mkey", "grp").orderBy(F.desc("c"), F.asc("label"))
    top_sub = subs.withColumn("rn", F.row_number().over(wsub)).filter("rn = 1").select(
        F.col("mkey").alias("skey"), F.col("grp").alias("sgrp"),
        F.col("label").alias("top_subtype"),
    )

    typed = top.join(
        top_sub,
        (F.col("mkey") == F.col("skey")) & (F.col("pred_group") == F.col("sgrp")),
        "left",
    ).select("mkey", "pred_group", "top_subtype")
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

    # ------------------------------------------------------------------
    # ensemble extras: pooled winner confidence + the packed per-side
    # distributions (pack_confidences, batched_main_NER.py:396-413) the
    # resolution maze consumes (pipeline/ensemble_rules.py)
    # ------------------------------------------------------------------
    wm = Window.partitionBy("mkey")
    pnorm = (
        pooled.withColumn("tot", F.sum("p").over(wm))
        .withColumn("conf_norm", F.col("p") / F.col("tot"))
    )
    topconf = pnorm.select(
        F.col("mkey").alias("tkey"), F.col("grp").alias("tgrp"), "conf_norm"
    )

    # per-side top subtype (side-LOCAL counts — the decoration each side's
    # aggregate_entities run would carry)
    wssub = Window.partitionBy("mkey", "side", "grp").orderBy(F.desc("c"), F.asc("label"))
    side_topsub = (
        g1.withColumn("rn", F.row_number().over(wssub)).filter("rn = 1")
        .select(
            F.col("mkey").alias("xkey"), F.col("side").alias("xside"),
            F.col("grp").alias("xgrp"), F.col("label").alias("side_sub"),
        )
    )
    entries = side_grp.join(
        side_topsub,
        (F.col("mkey") == F.col("xkey")) & (F.col("side") == F.col("xside"))
        & (F.col("grp") == F.col("xgrp")),
        "left",
    )
    packed = F.when(
        F.col("side_sub").isNotNull() & (F.col("side_sub") != F.col("grp")),
        F.concat("grp", F.lit("["), "side_sub", F.lit("]")),
    ).otherwise(F.col("grp"))
    conf9 = F.round("conf", 9)
    entries = entries.select(
        "mkey", "side",
        F.struct(
            (-conf9).alias("nc"), F.col("grp").alias("g"),
            packed.alias("e"), conf9.alias("conf"),
        ).alias("entry"),
    )
    side_dists = entries.groupBy("mkey", "side").agg(
        F.transform(
            F.array_sort(F.collect_list("entry")),
            lambda s: F.struct(s["e"].alias("e"), s["conf"].alias("conf")),
        ).alias("dist")
    )
    dists = side_dists.groupBy("mkey").agg(
        F.first(F.when(F.col("side") == "cs", F.col("dist")), ignorenulls=True).alias("cs_dist"),
        F.first(F.when(F.col("side") == "ci", F.col("dist")), ignorenulls=True).alias("ci_dist"),
    )

    typed_d = (
        typed.join(dists, "mkey")
        .join(
            topconf,
            (F.col("mkey") == F.col("tkey")) & (F.col("pred_group") == F.col("tgrp")),
        )
        .select(
            "mkey", "pred_group", "prediction",
            F.round("conf_norm", 9).alias("conf"), "cs_dist", "ci_dist",
        )
    )
    out = mm.join(typed_d, "mkey").select(
        "url", "sent_idx", "mention_idx", "begin_tok", "end_tok", "surface",
        "pred_group", "prediction", "conf", "cs_dist", "ci_dist",
    )
    # numeric shortcut: the dummy-descriptor run collapses to a single
    # MEASURE[NUMBER] entry on both sides (main_NER.py:486-496 shortcut)
    num_dist = F.array(F.struct(F.lit("MEASURE[NUMBER]").alias("e"), F.lit(1.0).alias("conf")))
    numeric_d = numeric.select(
        "*",
        F.lit(1.0).alias("conf"),
        num_dist.alias("cs_dist"),
        num_dist.alias("ci_dist"),
    )
    return out.unionByName(numeric_d)
