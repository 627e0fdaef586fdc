"""End-to-end curation manifest — the composed "build the training set"
pipeline the individual operators exist for: quality classification ->
near-duplicate removal (keep the cluster representative) -> group-level
train/val/test split -> temperature-balanced mix sampling over the
SURVIVORS. One audit row per input document, flags for every decision, so
downstream consumers filter ``keep`` while auditors see exactly why each
dropped document was dropped.

Stage order matters and is part of the contract: the sqrt-mix cap is
computed over the quality+dedup SURVIVOR pool (a mix rank computed over
the raw corpus would re-admit documents whose cheaper twin was dropped
by dedup and under-fill sources whose docs were mostly boilerplate).

Scale posture is inherited from the parts: quality is one narrow scan,
dedup is the capped LSH chain + star-CC, split is stateless, and the mix
rank is one window per source over the survivor pool. The final manifest
assembly is doc_id-keyed equi-joins of decision tables each no larger
than the corpus — no broadcast of anything corpus-sized, no new shuffle
shape beyond the parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unsupervised_ner_spark.ops.dedup import dedup_clusters
from unsupervised_ner_spark.ops.sampling import split_assign, sqrt_mix_sample
from unsupervised_ner_spark.ops.textstats import doc_stats, quality_class


def curated_manifest(documents: DataFrame, k_mix: int = 4) -> DataFrame:
    """documents(doc_id, text, lang, source, ...) -> one row per input doc:
    (doc_id, lang, source, quality, is_dup, split, keep).

    ``is_dup`` is true for every non-representative member of a near-dup
    cluster (the representative — the cluster's min doc_id — survives).
    ``keep`` = quality == 'good' AND NOT is_dup AND selected by the
    sqrt-mix cap over the survivor pool."""
    base = documents.select("doc_id", "lang", "source")
    quality = quality_class(doc_stats(documents))
    clusters = dedup_clusters(documents).select(
        "doc_id", (F.col("doc_id") != F.col("cluster_id")).alias("is_dup")
    )
    splits = split_assign(documents).select("doc_id", "split")

    flagged = (
        base.join(quality, "doc_id")
        .join(clusters, "doc_id", "left")
        .join(splits, "doc_id")
        .withColumn("is_dup", F.coalesce(F.col("is_dup"), F.lit(False)))
    )
    survivors = flagged.filter(
        (F.col("quality") == "good") & ~F.col("is_dup")
    ).select("doc_id", "source")
    mix_kept = sqrt_mix_sample(survivors, k=k_mix).select(
        "doc_id", F.lit(True).alias("mix_keep")
    )
    return (
        flagged.join(mix_kept, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "source",
            "quality",
            "is_dup",
            "split",
            (
                (F.col("quality") == "good")
                & ~F.col("is_dup")
                & F.coalesce(F.col("mix_keep"), F.lit(False))
            ).alias("keep"),
        )
    )


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass column profiler — the data-quality summary a pipeline
    publishes per ingest batch (row/null/distinct counts, min/max) so
    schema drift and null storms surface BEFORE downstream jobs consume
    the batch. Output: one row per profiled column with n_rows, n_null,
    n_distinct (null-excluding, like SQL COUNT(DISTINCT)), and min/max
    rendered as strings (profile only integer/string/date columns: float
    string-rendering is engine-dependent).

    Scale shape: ONE aggregate pass computes every column's statistics
    together (no per-column rescans), then an in-place explode unpivots
    the 1-row result — the explode input is one row, so the unpivot is
    free. countDistinct plans as partial aggregates (no naive global
    distinct); for approximate-tolerant dashboards swap in
    approx_count_distinct, documented knob."""
    from unsupervised_ner_spark.ops.layout import spread_small_scan

    # The 4-way countDistinct plans an Expand (rows x (n_distincts + 1))
    # FEEDING the partial aggregate, which otherwise runs entirely inside
    # an under-split scan's single task (guide §2.5); the adaptive spread
    # parallelizes the expand+partial segment and is a structural no-op at
    # production file counts.
    df = spread_small_scan(df.select(*cols))
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).cast("long").alias(f"{c}__nn"),
            F.countDistinct(F.col(c)).cast("long").alias(f"{c}__nd"),
            F.min(F.col(c)).cast("string").alias(f"{c}__mn"),
            F.max(F.col(c)).cast("string").alias(f"{c}__mx"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"{c}__nn").alias("n_null"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__mn").alias("min_s"),
                F.col(f"{c}__mx").alias("max_s"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


# First-kill filter cascade: (rule name, predicate over doc_stats columns),
# evaluated IN ORDER — Gopher/C4-style thresholds, every comparison integer
# cross-multiplied so the DuckDB twin replays it bit-exactly.
FILTER_RULES = [
    ("too_short", lambda: F.col("n_tokens") < 40),
    ("low_stopword", lambda: F.col("n_stopword_tokens") * 100 < F.col("n_tokens") * 3),
    ("low_lexdiv", lambda: F.col("n_distinct_tokens") * 100 < F.col("n_tokens") * 40),
    ("high_punct", lambda: F.col("n_punct_chars") * 10 > F.col("n_chars")),
    ("long_words", lambda: F.col("n_chars") > F.col("n_tokens") * 12),
]


def filter_funnel(documents: DataFrame) -> DataFrame:
    """Quality-filter FUNNEL dashboard: run the ordered filter cascade
    with first-kill attribution and report, per stage, how many documents
    that rule killed and how many remain after it — the standard
    pipeline-tuning view (which rule does the work, where the corpus
    actually dies) every C4/Gopher-style curation run publishes before
    anyone trusts the survivor count. Returns one row per rule plus a
    final ``survivors`` row: (stage, rule, n_killed, n_remaining).

    Scale shape: ONE narrow scan assigns each doc its first matching rule
    (chained CASE over doc_stats integers), one map-side-combining
    aggregate onto the |rules|+1-row histogram, and the running
    ``n_remaining`` is a window over that BOUNDED table (never the
    corpus). Adding a rule = one list entry; the attribution stays
    single-pass."""
    kill = F.lit(None).cast("string")
    for name, pred in reversed(FILTER_RULES):
        kill = F.when(pred(), F.lit(name)).otherwise(kill)
    stage = F.lit(len(FILTER_RULES)).cast("long")
    for i, (name, _) in reversed(list(enumerate(FILTER_RULES))):
        stage = F.when(F.col("rule") == name, F.lit(i).cast("long")).otherwise(stage)
    hist = (
        doc_stats(documents)
        .select(F.coalesce(kill, F.lit("survivors")).alias("rule"))
        .groupBy("rule")
        .agg(F.count("*").cast("long").alias("n_killed"))
        .withColumn("stage", stage)
    )
    from pyspark.sql import Window

    w = Window.orderBy("stage").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = Window.partitionBy()
    return hist.select(
        "stage", "rule",
        F.when(F.col("rule") == "survivors", F.lit(0))
        .otherwise(F.col("n_killed")).cast("long").alias("n_killed"),
        (
            F.sum("n_killed").over(total)
            - F.sum(
                F.when(F.col("rule") == "survivors", F.lit(0))
                .otherwise(F.col("n_killed"))
            ).over(w)
        ).cast("long").alias("n_remaining"),
    )


def skyline2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """2-D skyline (Pareto frontier, both dimensions MINIMIZED) — the
    Börzsönyi et al. ICDE'01 operator: the distinct points no other point
    weakly dominates (<= in both dimensions, < in at least one). The
    multi-objective "best tradeoffs" query (cheapest-and-earliest orders,
    shortest-and-highest-quality documents) a plain ORDER BY cannot
    answer. Returns the skyline points as (x, y, n_rows) with n_rows the
    exact number of input rows sitting on each point.

    Algorithm (exact, three bounded stages — never the naive O(n^2)
    dominance self-join):
      1. collapse to distinct points with counts (bounded by distinct
         value pairs, not corpus size);
      2. per x, only the min-y point can survive (any other same-x point
         is dominated by it) — one aggregate, output bounded by distinct
         x values;
      3. the classic sort-sweep as ONE window over that bounded
         candidate table: a candidate is skyline iff its y is strictly
         below every preceding candidate's y in (x asc) order
         (min(y) OVER rows-to-1-preceding; NULL for the global min-x).
    The window's input is the per-x candidate table — the only
    single-partition stage runs over |distinct x| rows, not the corpus.
    """
    x, y = F.col(x_col), F.col(y_col)
    pts = df.groupBy(x.alias("x"), y.alias("y")).agg(
        F.count("*").cast("long").alias("n_rows")
    )
    from pyspark.sql import Window

    wx = Window.partitionBy("x").orderBy(F.col("y").asc())
    cand = (
        pts.withColumn("rn", F.row_number().over(wx))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    sweep = Window.orderBy(F.col("x").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        cand.withColumn("m", F.min("y").over(sweep))
        .filter(F.col("m").isNull() | (F.col("y") < F.col("m")))
        .select(
            F.col("x").alias(x_col),
            F.col("y").alias(y_col),
            "n_rows",
        )
    )


def coverage_round_top1(remaining: DataFrame) -> DataFrame:
    """One greedy round of max_coverage_select: per-doc marginal count +
    (gain DESC, url ASC) top-1. Split out so the round's physical plan
    is capturable — the orderBy(...).limit(1) must compile to
    TakeOrdered (per-partition heads), never a global sort."""
    return (
        remaining.groupBy("url")
        .agg(F.count("*").cast("long").alias("gain"))
        .orderBy(F.desc("gain"), F.asc("url"))
        .limit(1)
    )


def max_coverage_select(doc_entities: DataFrame, k: int = 5) -> DataFrame:
    """Greedy maximum-coverage document selection — the submodular
    data-curation primitive (Nemhauser, Wolsey & Fisher 1978: greedy is
    a (1 - 1/e)-approximation; the CELF/distributed-greedy line scales
    it): pick ``k`` documents one at a time, each maximizing the number
    of NOT-YET-COVERED entities it mentions. This is "which k pages give
    the broadest entity coverage" — the seed-set selection a curation
    pipeline runs before expensive annotation, and the exact objective
    behind coverage-driven training-data selection.

    Input: (url, ent) pairs, deduplicated internally. Output: one row
    per selection round — (round, url, gain) with gain = marginal
    new-entity count (strictly positive; selection stops early if
    everything is covered). Ties break deterministically (gain DESC,
    url ASC), replayed by the oracle's ORDER BY ... LIMIT 1.

    Scale shape: the pair table is persisted once; each round is one
    anti-join against the covered-entity table (bounded by distinct
    entities, not corpus size), one map-side-combining per-doc count,
    and a TakeOrdered top-1 (per-partition heads, never a global sort);
    the covered table is checkpointed per round (feeds the anti-join and
    the next union — the er.hits lineage rule). The k driver-side
    single-row collects are O(k) scalar reads (the adaptive-cap
    precedent). k is the budget, typically << log of anything — the
    round count is the user's choice, not a convergence bound."""
    from unsupervised_ner_spark.caching import scoped_persist

    pairs = scoped_persist(
        doc_entities.select("url", "ent").distinct(), how="checkpoint"
    )
    spark = pairs.sparkSession
    covered = None
    chosen: list[tuple[int, str, int]] = []
    for r in range(1, int(k) + 1):
        remaining = (
            pairs if covered is None
            else pairs.join(covered, "ent", "left_anti")
        )
        best = coverage_round_top1(remaining).collect()
        if not best:
            break
        url, gain = best[0].url, int(best[0].gain)
        chosen.append((r, url, gain))
        new_cov = pairs.filter(F.col("url") == url).select("ent")
        covered = scoped_persist(
            new_cov if covered is None else covered.unionByName(new_cov),
            how="checkpoint",
        )
    return spark.createDataFrame(
        chosen, "round long, url string, gain long"
    )


def k_anonymity(
    events: DataFrame, k: int = 5, l_div: int = 3
) -> DataFrame:
    """Privacy audit of a training-data export — k-anonymity (Sweeney
    2002) and distinct-l-diversity (Machanavajjhala et al. 2007) over the
    quasi-identifier (event_type, day, coarse value bucket): a release
    keyed on those columns re-identifies a row when its QI group holds
    fewer than ``k`` rows, and leaks the sensitive attribute (user_id)
    when the group spans fewer than ``l_div`` distinct users. One row
    per QI group with exact counts and both violation flags — the table
    a suppression/generalization pass consumes directly (suppress
    violating groups, or coarsen the bucket and re-audit).

    The day and the floor(value/100) bucket are exact integer
    generalizations (no float leaves the operator); l-diversity uses the
    two-level aggregate device (triples_temporal precedent): level 1
    collapses to (QI, user), so level 2 counts distinct users as plain
    count(*) — no count-distinct Expand over the raw stream.

    Scale shape: ONE event-sized shuffle into the level-1 aggregate with
    map-side combining; everything downstream is bounded by the QI-group
    count."""
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    bucket = F.floor(F.col("value") / F.lit(100)).cast("long")
    per_user = events.select(
        "event_type", day.alias("day"), bucket.alias("value_bucket"),
        "user_id",
    ).groupBy("event_type", "day", "value_bucket", "user_id").agg(
        F.count("*").cast("long").alias("n")
    )
    return (
        per_user.groupBy("event_type", "day", "value_bucket")
        .agg(
            F.sum("n").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_users"),
        )
        .select(
            "event_type", "day", "value_bucket", "n_rows", "n_users",
            F.when(F.col("n_rows") < k, F.lit(1)).otherwise(F.lit(0))
            .cast("long").alias("is_k_violation"),
            F.when(F.col("n_users") < l_div, F.lit(1)).otherwise(F.lit(0))
            .cast("long").alias("is_l_violation"),
        )
    )


def fd_audit(df: DataFrame, cols: list[str]) -> DataFrame:
    """Functional-dependency discovery over a bounded column set — the
    data-profiling pass (Metanome/TANE's pairwise core) that tells a
    schema designer which columns determine which: for every ordered
    pair (lhs, rhs), does each lhs value map to exactly ONE rhs value?
    Output is one row per candidate FD with exact counts: distinct lhs
    values, distinct (lhs, rhs) pairs, lhs values carrying more than
    one rhs (the violators), the is_fd verdict, and the violation share
    in exact ppm.

    Scale shape: ONE event-sized shuffle total — the raw stream
    collapses once into the distinct value-combination table (bounded
    by the attribute domain product, persisted once), and every
    per-pair statistic is a bounded re-aggregation of that table.
    The naive formulation (k^2 count-distincts over raw rows) would
    shuffle the corpus 2*k*(k-1) times; this one never touches it
    again. A production profiler over wider schemas samples first —
    this operator is the exact kernel it runs on the sample."""
    from functools import reduce

    from unsupervised_ner_spark.caching import scoped_persist

    combos = scoped_persist(
        df.groupBy(*cols).agg(F.count("*").cast("long").alias("n_rows"))
    )
    outs = []
    for a in cols:
        for b in cols:
            if a == b:
                continue
            per_lhs = (
                combos.groupBy(a, b)
                .agg(F.count("*").alias("_nc"))
                .groupBy(a)
                .agg(F.count("*").cast("long").alias("n_rhs"))
            )
            outs.append(
                per_lhs.agg(
                    F.count("*").cast("long").alias("n_lhs_values"),
                    F.sum("n_rhs").cast("long").alias("n_pairs"),
                    F.sum((F.col("n_rhs") > 1).cast("long"))
                    .cast("long").alias("n_violating_lhs"),
                ).select(
                    F.lit(a).alias("lhs"), F.lit(b).alias("rhs"),
                    "n_lhs_values", "n_pairs", "n_violating_lhs",
                    F.when(F.col("n_violating_lhs") == 0, F.lit(1))
                    .otherwise(F.lit(0)).cast("long").alias("is_fd"),
                    F.expr(
                        "n_violating_lhs * 1000000 div n_lhs_values"
                    ).cast("long").alias("violation_ppm"),
                )
            )
    return reduce(lambda x, y: x.unionByName(y), outs)


CURRICULUM_STAGES = ["good", "lowlex", "boilerplate", "short"]


def curriculum_order(documents: DataFrame, bucket_hex: int = 2) -> DataFrame:
    """Quality-annealed curriculum ordering (Bengio et al. ICML'09
    applied as data curriculum): every document gets ONE dense global
    training rank — clean docs first, degraded classes later — so the
    loader streams the corpus in curriculum order without a global
    sort. Stage = the integer index of the doc's quality_class in
    ``CURRICULUM_STAGES`` (good -> lowlex -> boilerplate -> short);
    within a stage the order is the deterministic (md5(doc_id), doc_id)
    shuffle (curricula must still be locally i.i.d. — hash order is the
    seeded shuffle both engines replay).

    Scale shape: the global dense rank is the TWO-LEVEL prefix sum
    (pack_sequences precedent): per-(stage, md5-bucket) row_number (256
    concurrent in-bucket sorts) plus an exclusive prefix sum over the
    bounded (stage x bucket) count table broadcast back — never a
    one-partition global window. Since the bucket is a prefix of the
    md5, (stage, bucket, h, doc_id) order == (stage, h, doc_id) order,
    which is the flat rank the oracle computes at test scale."""
    from pyspark.sql import Window

    from unsupervised_ner_spark.ops.textstats import doc_stats, quality_class

    q = quality_class(doc_stats(documents))
    md5_id = F.md5(F.col("doc_id").cast("string"))
    base = q.select(
        "doc_id", "quality",
        F.expr(
            "array_position(array("
            + ", ".join(f"'{s}'" for s in CURRICULUM_STAGES)
            + "), quality) - 1"
        ).cast("long").alias("stage"),
        F.substring(md5_id, 1, bucket_hex).alias("bucket"),
        md5_id.alias("h"),
    )
    w_in = Window.partitionBy("stage", "bucket").orderBy("h", "doc_id")
    ranked = base.select(
        "doc_id", "quality", "stage", "bucket",
        (F.row_number().over(w_in) - 1).cast("long").alias("r_in"),
    )
    totals = base.groupBy("stage", "bucket").agg(
        F.count("*").cast("long").alias("n")
    )
    w_b = Window.orderBy("stage", "bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals.select(
        "stage", "bucket",
        (F.sum("n").over(w_b) - F.col("n")).cast("long").alias("off"),
    )
    return (
        ranked.join(F.broadcast(offsets), ["stage", "bucket"])
        .select(
            "doc_id", "quality", "stage",
            (F.col("off") + F.col("r_in")).cast("long")
            .alias("curriculum_rank"),
        )
    )


def dedup_survivorship(documents: DataFrame) -> DataFrame:
    """Quality-aware duplicate-group survivorship — WHICH copy to keep:
    dedup_clusters keeps min-doc_id (stable but quality-blind); real
    pipelines keep the BEST copy of each near-dup group (the cleanest
    full-length variant), because the duplicates often include
    truncated or boilerplate-wrapped mirrors. Per cluster the
    representative is argmin of (quality stage ASC, n_tokens DESC,
    doc_id ASC) — best class first, longest inside a class, id as the
    total-order tail — via one struct-min aggregate. Output per
    cluster: size, the representative with its class and length, and
    the drop count.

    Scale shape: the cluster membership joins the per-doc integer
    stats on doc_id (the corpus' natural key), then ONE map-side-
    combining struct-min aggregate per cluster. Stage order is
    CURRICULUM_STAGES (shared with curriculum_order)."""
    from unsupervised_ner_spark.ops.dedup import dedup_clusters
    from unsupervised_ner_spark.ops.textstats import doc_stats, quality_class

    memb = dedup_clusters(documents).select("doc_id", "cluster_id")
    st = doc_stats(documents)
    stats = st.select(
        "doc_id", F.col("n_tokens").cast("long").alias("n_tokens")
    )
    q = quality_class(st)
    stage = F.expr(
        "CASE quality WHEN 'good' THEN 0 WHEN 'lowlex' THEN 1"
        " WHEN 'boilerplate' THEN 2 ELSE 3 END"
    ).cast("long")
    joined = (
        memb.join(stats, "doc_id")
        .join(q, "doc_id")
        .select(
            "cluster_id", "doc_id", "n_tokens", "quality",
            stage.alias("stage"),
        )
    )
    pick = F.min(
        F.struct(
            F.col("stage"),
            (-F.col("n_tokens")).alias("neg_tok"),
            F.col("doc_id"),
            F.col("quality"),
        )
    )
    return joined.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        pick.getField("doc_id").cast("long").alias("rep_doc"),
        pick.getField("quality").alias("rep_quality"),
        (-pick.getField("neg_tok")).cast("long").alias("rep_tokens"),
    ).select(
        "cluster_id", "n_docs", "rep_doc", "rep_quality", "rep_tokens",
        (F.col("n_docs") - 1).cast("long").alias("n_dropped"),
    )
