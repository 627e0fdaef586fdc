"""Offline bootstrap-vocabulary operators (S10 / A7 / A8 / A9 / W4).

Spark re-expressions of the reference's offline label tooling:

- ``merge_label_files``    — ner_labeling/construct_bs.py:35-57 + gen_bs.sh:3:
  union per-type label files, lowercase terms, dedupe labels per term in
  first-seen order, strip UNTAGGED_ENTITY when other labels exist, order by
  term.
- ``label_histogram``      — gen_bs.sh:6 (`sort | uniq -c | sort -nr`).
- ``dedupe_lines``         — ensemble/pick_unique_lines.py:18-30 (first
  occurrence wins).
- ``harvest_ci_candidates``— W4 algorithmic CI-label harvesting for human
  verification (dictify_ner_response, batched_main_NER.py:142-153): from
  blank-probe sentences ("<span> :__entity__"), emit (surface, label) rows
  as bootstrap-candidate additions — an append-only side table instead of
  the reference's algorthimic_ci_tags.txt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_label_files(label_dfs: list[DataFrame]) -> DataFrame:
    """Each input: (term string, label string). Output: (term, labels
    array<string>) with construct_bs merge semantics, ordered by term."""
    tagged = []
    for i, df in enumerate(label_dfs):
        w = Window.partitionBy().orderBy(F.monotonically_increasing_id())
        tagged.append(
            df.select(
                F.lower("term").alias("term"), "label", F.lit(i).alias("src")
            )
        )
    allrows = tagged[0]
    for t in tagged[1:]:
        allrows = allrows.unionByName(t)
    # first-seen order: by (src, original order) — approximate original file
    # order with a per-src sequence
    w = Window.partitionBy("term", "label").orderBy("src")
    first = (
        allrows.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .groupBy("term")
        .agg(
            F.array_sort(F.collect_list(F.struct("src", "label"))).alias("pairs")
        )
        .select(
            "term",
            F.transform(F.col("pairs"), lambda p: p["label"]).alias("labels0"),
        )
    )
    labels = F.array_distinct(F.col("labels0"))
    stripped = F.when(
        (F.size(labels) > 1) & F.array_contains(labels, "UNTAGGED_ENTITY"),
        F.array_remove(labels, "UNTAGGED_ENTITY"),
    ).otherwise(labels)
    return first.select("term", stripped.alias("labels")).orderBy("term")


def label_histogram(labels: DataFrame) -> DataFrame:
    """(.., label) -> (label, n) ordered desc — gen_bs.sh:6."""
    return (
        labels.groupBy("label")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("label"))
    )


def dedupe_lines(df: DataFrame, col: str = "line") -> DataFrame:
    """Exact dedup keeping first occurrence (pick_unique_lines.py:18-30)."""
    w = Window.partitionBy(col).orderBy(F.monotonically_increasing_id())
    return df.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")


def harvest_ci_candidates(tagged: DataFrame) -> DataFrame:
    """W4: blank-probe sentences contribute (surface, harvested_label) rows.

    The reference harvests when a CI-only response tags the trailing bare
    marker (batched_main_NER.py:147-153), writing `term label` lines for
    manual verification; here: every mention of a blank-probe sentence emits
    its surface + base predicted group."""
    is_blank = F.col("sent").endswith(" :__entity__")
    m = tagged.filter(is_blank).select(
        "url", "sent_idx", "words", F.explode("mentions").alias("m")
    )
    # bare-marker mentions have empty surfaces; the harvested term is the
    # word preceding the marker (ret_dict[count-2]["term"],
    # batched_main_NER.py:152 — which presupposes count >= 2, i.e. a word
    # DOES precede the marker). element_at is 1-based, so begin_tok == 0
    # (sentence-initial bare marker) must be guarded or it raises; such
    # mentions have no harvestable term and are dropped by the NULL filter.
    surface = F.when(
        F.col("m.surface") != "", F.col("m.surface")
    ).when(
        F.col("m.begin_tok") > 0, F.element_at("words", F.col("m.begin_tok"))
    )
    return m.select(
        "url",
        "sent_idx",
        surface.alias("surface"),
        F.split(F.col("m.prediction"), r"\[")[0].alias("harvested_label"),
    ).filter((F.col("harvested_label") != "OTHER") & F.col("surface").isNotNull())
