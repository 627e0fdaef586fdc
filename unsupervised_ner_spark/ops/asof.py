"""Distributed as-of (most-recent-preceding) join.

Spark has no ASOF JOIN operator; the naive encoding — an inequality join
``l.ts >= r.ts`` + a per-left-row argmax — plans as a
BroadcastNestedLoop/cartesian range join that is O(|L|·|R|) per key and
collapses at scale. This operator re-expresses the semantics as the
classic UNION + ORDERED WINDOW construction:

1. union both sides into one keyed stream, right rows flagged 0 and left
   rows flagged 1 so that at equal timestamps the right row sorts FIRST
   (i.e. an exact-timestamp match is visible to the left row);
2. one window per join key ordered by (ts, side, tie) takes
   ``last(right_payload, ignorenulls=True)`` over
   ROWS UNBOUNDED PRECEDING..CURRENT;
3. keep the left rows: each carries the most recent right row at-or-before
   its timestamp, or NULL if none precedes it.

Scale shape: ONE hash exchange on the join key + a per-partition sort —
exactly a sort-merge join's cost, with no range blowup; a hot key is one
sort partition, never a quadratic pair set. This is the standard
streaming/temporal-table formulation (Flink temporal joins and DuckDB's
ASOF JOIN lower to the same ordered scan).

Determinism: ties inside the right side at equal timestamps resolve to the
largest ``right_tie`` value (last in window order); document order never
matters. The DuckDB oracle replays the identical window (IGNORE NULLS is
supported there), so the gate checks tie semantics too, not just the happy
path.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    right_tie: str,
) -> DataFrame:
    """For every left row, attach the most recent right row with
    ``right_ts <= left_ts`` sharing the ``on`` keys (NULLs if none).

    ``left_cols`` / ``right_cols`` are the payload columns carried from
    each side (right payload columns come back prefixed ``r_``);
    ``right_tie`` (must be in ``right_cols``) breaks equal-timestamp ties
    within the right side deterministically (largest wins).
    """
    on = list(on)
    lp = F.struct(*[F.col(c) for c in left_cols]).alias("_lp")
    rp = F.struct(*[F.col(c) for c in right_cols]).alias("_rp")
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_tie"),
        lp,
        F.lit(None).cast(
            right.select(rp).schema["_rp"].dataType.simpleString()
        ).alias("_rp"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(right_tie).cast("long").alias("_tie"),
        F.lit(None).cast(
            left.select(lp).schema["_lp"].dataType.simpleString()
        ).alias("_lp"),
        rp,
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t"), F.col("_side"), F.col("_tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn("_match", F.last("_rp", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    out_cols = (
        [F.col(c) for c in on]
        + [F.col(f"_lp.{c}").alias(c) for c in left_cols]
        + [F.col(f"_match.{c}").alias(f"r_{c}") for c in right_cols]
    )
    return matched.select(*out_cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_us: int,
    point_cols: Sequence[str],
    interval_cols: Sequence[str],
) -> DataFrame:
    """Distributed point-in-interval join (``start <= t < end``) WITHOUT
    an equi key — the temporal containment join Spark has no native
    operator for (SPARK range-join hints exist only on Databricks; naive
    SQL plans it as BroadcastNestedLoop over the corpus).

    Strategy: BUCKET BINNING. Time is cut into fixed ``bucket_us`` cells;
    every interval explodes to the cells it covers, each point maps to
    exactly ONE cell, and the join becomes a plain hash equi-join on the
    cell id plus a residual range filter. Because a point lives in one
    cell only, no post-join dedup is needed. Pick ``bucket_us`` ~ the max
    interval length: fan-out stays <= 2 rows per interval while cell
    population (the shuffle skew bound) stays ~ the number of
    concurrently-open intervals — the standard binned-range-join trade
    (Chawda et al., "Processing Interval Joins On Map-Reduce", EDBT'14).

    Returns one row per containment with the requested payload columns
    (interval side prefixed ``iv_``) plus the tz-invariant microsecond
    offset ``us_into_interval`` (absolute timestamps are session-timezone
    sensitive across engines; an offset is not — the asof_join
    precedent).

    Scale shape: one narrow explode (``sequence`` over covered cells, <=
    len/bucket + 1 rows per interval), one hash exchange per side keyed
    on the cell, a residual filter — no nested loop, no corpus-sized
    broadcast, no sort. Skewed cells (flash-crowd intervals) are ordinary
    agg-key skew, AQE-splittable."""
    # parquet timestamps load as TIMESTAMP_NTZ; the session tz is pinned
    # UTC (session.get_spark), so the cast is an exact monotone epoch map
    def _us(c):
        return F.unix_micros(F.col(c).cast("timestamp"))

    p_us = _us(point_ts)
    s_us = _us(start_ts)
    e_us = _us(end_ts)
    pts = points.select(
        *point_cols, p_us.alias("_p_us"),
        F.floor(p_us / bucket_us).cast("long").alias("_cell"),
    )
    ivs = intervals.select(
        *[F.col(c).alias(f"iv_{c}") for c in interval_cols],
        s_us.alias("_s_us"), e_us.alias("_e_us"),
        F.explode(
            F.sequence(
                F.floor(s_us / bucket_us).cast("long"),
                F.floor(e_us / bucket_us).cast("long"),
            )
        ).alias("_cell"),
    )
    return (
        pts.join(ivs, "_cell")
        .filter((F.col("_s_us") <= F.col("_p_us")) & (F.col("_p_us") < F.col("_e_us")))
        .select(
            *point_cols,
            *[f"iv_{c}" for c in interval_cols],
            (F.col("_p_us") - F.col("_s_us")).cast("long").alias("us_into_interval"),
        )
    )


def funnel_steps(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered conversion funnel over the event stream — the product
    analytics primitive: per user, the EARLIEST step-1 event, then the
    earliest step-2 event STRICTLY AFTER it, then the earliest step-3
    after that (strict event-time order with event_id as the
    deterministic tie-break inside an equal timestamp). Emits how far
    each user got plus the inter-step gaps in microseconds — gaps, not
    absolute timestamps, are hashed (absolute epoch values are
    session-timezone-sensitive across engines; a difference is not —
    the asof_join precedent).

    Output: (user_id, reached_step 0..len(steps), gap12_us, gap23_us, ...
    with -1 where the step was never reached).

    Scale shape: one user-keyed min-aggregate per step plus a user-keyed
    equi-join per step boundary — every stage is keyed on user_id (the
    partitioning the event store shuffles on anyway); a hot user is one
    reducer key (AQE skew-join), nothing corpus-quadratic, no window
    over event history."""
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    # (time, id) total order packed into a struct-min per user
    ev = events.select(
        "user_id", "event_type", ts_us.alias("t"),
        F.col("event_id").cast("long").alias("eid"),
    )
    cur = (
        ev.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min(F.struct("t", "eid")).alias("s1"))
        .select("user_id", F.col("s1.t").alias("t1"))
    )
    out = cur
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            ev.filter(F.col("event_type") == step)
            .join(out.select("user_id", F.col(f"t{i - 1}")), "user_id")
            .filter(F.col("t") > F.col(f"t{i - 1}"))
            .groupBy("user_id")
            .agg(F.min(F.struct("t", "eid")).alias("s"))
            .select("user_id", F.col("s.t").alias(f"t{i}"))
        )
        out = out.join(nxt, "user_id", "left")
    reached = F.lit(1)
    for i in range(2, len(steps) + 1):
        reached = reached + F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0)
    gaps = [
        F.coalesce(F.col(f"t{i}") - F.col(f"t{i - 1}"), F.lit(-1))
        .cast("long")
        .alias(f"gap{i - 1}{i}_us")
        for i in range(2, len(steps) + 1)
    ]
    return out.select(
        "user_id", reached.cast("long").alias("reached_step"), *gaps
    )


def retention_cohorts(events: DataFrame, period_days: int = 7) -> DataFrame:
    """Cohort retention matrix — the longitudinal complement of
    :func:`funnel_steps`: cohort = the user's FIRST activity period
    (wall-clock day index = datediff vs 1970-01-01 on the NTZ timestamp
    — timezone-free in BOTH engines, unlike epoch extraction, which
    reads the session timezone; then exact integer floor-division by
    ``period_days``), and per (cohort, period offset) the count of
    cohort users active in that offset, the cohort size (the offset-0
    row — structurally present because a user is active in their own
    first period), and retention_ppm as the exact integer
    ``n_users * 1e6 DIV cohort_size``.

    Scale shape: one distinct (user, period) aggregate, one user-keyed
    min-aggregate for the cohort table, one user-keyed equi-join of two
    user-bounded tables, then a map-side-combining aggregate onto the
    tiny (cohort x offset) matrix and a cohort-keyed self-join of that
    matrix for the size column — nothing bigger than (users) ever
    shuffles twice, and a hot user is a single reducer key."""
    period = F.expr(
        f"CAST(datediff(CAST(ts AS DATE), DATE'1970-01-01')"
        f" DIV {int(period_days)} AS BIGINT)"
    )
    active = (
        events.select("user_id", period.alias("period"))
        .distinct()
    )
    first = active.groupBy("user_id").agg(
        F.min("period").alias("cohort_period")
    )
    mat = (
        active.join(first, "user_id")
        .groupBy(
            "cohort_period",
            (F.col("period") - F.col("cohort_period")).alias("period_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )
    size = mat.filter(F.col("period_offset") == 0).select(
        "cohort_period", F.col("n_users").alias("cohort_size")
    )
    return mat.join(size, "cohort_period").select(
        "cohort_period", "period_offset", "n_users", "cohort_size",
        F.expr("CAST(n_users * 1000000 DIV cohort_size AS BIGINT)")
        .alias("retention_ppm"),
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """Clickstream Markov transition table — the behavioral model next to
    :func:`funnel_steps`' fixed path: per user, events ordered by
    (event time, event_id), every event contributes the transition
    (previous type -> its type) with a '_start' sentinel at the head,
    and each user's last event contributes (type, '_end'). Output per
    (from_type, to_type): the transition count, the from-state total,
    and the exact-integer conditional probability
    ``trans_ppm = n_trans * 1e6 DIV n_from``.

    Scale shape: ONE window pass partitioned by user_id (the event
    store's native sharding; a hot user is one partition — the same
    posture as rel_window_sessions), then a map-side-combining aggregate
    onto the bounded (type x type) matrix and a from_type-keyed
    self-merge of that tiny table; nothing corpus-sized shuffles
    twice."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros(F.col("ts").cast("timestamp")), "event_id"
    )
    seq = events.select(
        "user_id", "event_type", "ts", "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    )
    trans = seq.select(
        F.coalesce("prev_type", F.lit("_start")).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).unionAll(
        seq.filter(F.col("next_type").isNull()).select(
            F.col("event_type").alias("from_type"),
            F.lit("_end").alias("to_type"),
        )
    )
    mat = trans.groupBy("from_type", "to_type").agg(
        F.count("*").cast("long").alias("n_trans")
    )
    tot = mat.groupBy("from_type").agg(
        F.sum("n_trans").cast("long").alias("n_from")
    )
    return mat.join(tot, "from_type").select(
        "from_type", "to_type", "n_trans", "n_from",
        F.expr("CAST(n_trans * 1000000 DIV n_from AS BIGINT)")
        .alias("trans_ppm"),
    )


def cusum_changepoint(events: DataFrame) -> DataFrame:
    """Exact-integer CUSUM changepoint detection per event type — the
    rate-shift monitor beside event_transitions/retention_cohorts: daily
    counts (wall-clock day index vs 1970-01-01, the retention
    timezone-free device), cumulative deviation against the uniform rate
    as the cross-multiplied integer dev_i = cum_i * n_days - i * total
    (a float-free CUSUM: dev/(n_days*total) is the classic normalized
    statistic, its argmax is identical), peak day by (|dev| DESC, day
    ASC) via the min-struct argmin. A spike or regime change bends the
    cumulative-count curve away from the straight uniform line exactly
    where |dev| peaks.

    Scale shape: ONE map-side-combining (type, day) aggregate bounds
    everything downstream by types x days — the windows and the final
    argmin run over that bounded daily table, never over event rows; a
    hot day is one reducer key in the daily aggregate."""
    from pyspark.sql import Window

    ev = events.select(
        "event_type",
        F.datediff(F.col("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long").alias("day"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count("*").cast("long").alias("c")
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    wp = Window.partitionBy("event_type")
    cum = daily.select(
        "event_type", "day",
        F.sum("c").over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long").alias("s"),
        F.row_number().over(wo).cast("long").alias("i"),
        F.sum("c").over(wp).cast("long").alias("total"),
        F.count("*").over(wp).cast("long").alias("n_days"),
    )
    dev = cum.select(
        "event_type", "day", "n_days", "total",
        (F.col("s") * F.col("n_days") - F.col("i") * F.col("total"))
        .alias("dev"),
    )
    peak = F.min(
        F.struct(
            (-F.abs(F.col("dev"))).alias("neg_abs"),
            F.col("day").alias("day"),
            F.col("dev").alias("dev"),
        )
    )
    return (
        dev.groupBy("event_type")
        .agg(
            F.max("n_days").cast("long").alias("n_days"),
            F.max("total").cast("long").alias("total"),
            peak.alias("p"),
        )
        .select(
            "event_type", "n_days", "total",
            F.col("p.day").alias("peak_day"),
            F.col("p.dev").cast("long").alias("peak_dev"),
        )
    )


def trend_ols(events: DataFrame, scale: int = 1_000_000) -> DataFrame:
    """Exact-integer least-squares trend per event type — the monotone
    drift monitor beside cusum_changepoint (which finds WHERE the rate
    bends, while this measures the overall direction): daily counts on
    the wall-clock day index, then the closed-form OLS slope over
    (day, count) as the integer pair slope_num = n*Sxy - Sx*Sy,
    slope_den = n*Sxx - Sx*Sx (den >= 0, zero iff a single day). Days
    are shifted to day' = day - min(day) per type BEFORE the sums — the
    slope is shift-invariant and the shift keeps every sufficient
    statistic near the origin (Sx ~ n*span, not n*epoch_day), which is
    what keeps n*Sxy inside int64 at corpus scale. slope_ppm =
    sign(num) * (scale*|num| div den) — the sign is factored out so the
    engine and the oracle never disagree on negative integer division
    (floor vs truncate); the exact artifact is the (num, den) pair.

    Scale shape: ONE map-side-combining (type, day) aggregate bounds
    everything; the min-day shift and the five sufficient statistics
    are one more aggregate over that bounded daily table. Never a
    window, never a join."""
    ev = events.select(
        "event_type",
        F.datediff(F.col("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long").alias("day"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count("*").cast("long").alias("c")
    )
    mins = daily.groupBy("event_type").agg(F.min("day").alias("day0"))
    d = daily.join(F.broadcast(mins), "event_type").select(
        "event_type", (F.col("day") - F.col("day0")).alias("x"), F.col("c").alias("y")
    )
    s = d.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    num = (F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy"))
    den = (F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return s.select(
        "event_type", "n_days",
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
        F.when(
            den > 0,
            F.signum(num).cast("long")
            * F.expr(
                f"{scale} * abs(n_days * sxy - sx * sy)"
                " div (n_days * sxx - sx * sx)"
            ),
        ).otherwise(F.lit(0)).cast("long").alias("slope_ppm"),
    )


def scd2_history(events: DataFrame) -> DataFrame:
    """Slowly-changing-dimension Type-2 history build from the event
    change log — the MERGE-history sibling of rel_merge_upsert's
    point-in-time upsert: per user, consecutive runs of the same
    event_type (the tracked attribute) compress into validity intervals
    [valid_from_us, valid_to_us) with the last run open (valid_to NULL,
    is_current=1). Timestamps are carried as exact epoch microseconds
    (portable across engines; no timezone arithmetic). This is the
    gaps-and-islands compress applied to dimension-history building —
    what an Iceberg MERGE INTO ... WHEN MATCHED AND changed pipeline
    materializes incrementally, built here in one batch pass.

    Scale shape: one lag window on the user partitioning (the event
    store's native sharding — rel_transitions precedent), one
    (user, island) map-side-combining aggregate, then the lead window
    runs over the BOUNDED island table, never over event rows."""
    from pyspark.sql import Window

    ev = events.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    chg = ev.select(
        "user_id", "state", "ts_us", "event_id",
        F.when(
            F.lag("state").over(w).isNull()
            | (F.lag("state").over(w) != F.col("state")),
            1,
        ).otherwise(0).alias("chg"),
    )
    runs = chg.select(
        "user_id", "state", "ts_us",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long").alias("island"),
    )
    islands = runs.groupBy("user_id", "island").agg(
        F.min("state").alias("state"),
        F.min("ts_us").cast("long").alias("valid_from_us"),
        F.count("*").cast("long").alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("island")
    return islands.select(
        "user_id", "island", "state", "valid_from_us", "n_events",
        F.lead("valid_from_us").over(w2).cast("long").alias("valid_to_us"),
    ).withColumn(
        "is_current",
        F.when(F.col("valid_to_us").isNull(), 1).otherwise(0).cast("long"),
    )


def late_events(events: DataFrame, delay_mod: int = 97) -> DataFrame:
    """Watermark-lateness histogram — the diagnostic that SIZES a
    structured-streaming watermark before deploying one (too tight drops
    events, too loose holds state): per event type, how many events
    arrive with a given processing delay, bucketed by decimal magnitude
    (on-time, <10 s, <100 s, <1000 s, >=1000 s), with each bucket's max
    delay and exact-integer share of the type's traffic in ppm. The
    processing delay is synthesized deterministically from the event id
    (delay_s = (event_id mod ``delay_mod``)^2 — a heavy-tailed shape:
    most events near-on-time, a long quadratic tail), standing in for a
    (proc_ts - event_ts) column a real ingest table carries.

    Scale shape: one narrow map (delay + bucket per row, no join) into
    ONE map-side-combining (type, bucket) aggregate bounded by
    types x 5; the share join is against the types-bounded total."""
    d = F.pmod(F.col("event_id"), F.lit(delay_mod))
    delay_s = (d * d).cast("long")
    bucket = (
        F.when(delay_s == 0, F.lit(0))
        .when(delay_s < 10, F.lit(1))
        .when(delay_s < 100, F.lit(2))
        .when(delay_s < 1000, F.lit(3))
        .otherwise(F.lit(4))
    ).cast("long")
    ev = events.select(
        "event_type", delay_s.alias("delay_s"), bucket.alias("bucket")
    )
    hist = ev.groupBy("event_type", "bucket").agg(
        F.count("*").cast("long").alias("n_events"),
        F.max("delay_s").cast("long").alias("max_delay_s"),
    )
    tot = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_total")
    )
    return hist.join(F.broadcast(tot), "event_type").select(
        "event_type", "bucket", "n_events", "max_delay_s",
        F.expr("n_events * 1000000 div n_total").cast("long")
        .alias("share_ppm"),
    )


def corr_pairs(events: DataFrame, scale: int = 1_000_000) -> DataFrame:
    """Pairwise correlation of event types' daily-count series — the
    co-movement companion of trend_ols (one series' direction) and
    cusum_changepoint (one series' bend): for each type pair, the exact
    integer sufficient statistics over their SHARED days (n, sums,
    cross/self products), Pearson numerator corr_num = n*Sxy - Sx*Sy and
    both variance terms, plus corr_sign and corr2_ppm ~ 10^6 * r^2.

    corr2_ppm uses the two-step exact-order division
    (|num|*scale div var_x) * |num| div var_y — mathematically within
    1 ppm of r^2*10^6 but chosen because the one-step num^2*scale
    overflows int64 exactly where the statistic is healthiest; both
    engines run the identical integer steps so the gate compares the
    same number. int64 envelope: |num| < 9*10^12.

    Scale shape: ONE bounded (type, day) aggregate; the pairing is a
    self equi-join ON DAY of that bounded table (fan-out = types^2 per
    day, schema-bounded); one (type_a, type_b) aggregate ends it. Raw
    event rows never join."""
    ev = events.select(
        "event_type",
        F.datediff(F.col("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long").alias("day"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count("*").cast("long").alias("c")
    )
    a = daily.select(
        F.col("event_type").alias("type_a"), "day", F.col("c").alias("x")
    )
    b = daily.select(
        F.col("event_type").alias("type_b"),
        F.col("day").alias("day_b"),
        F.col("c").alias("y"),
    )
    j = a.join(
        b, (F.col("day") == F.col("day_b")) & (F.col("type_a") < F.col("type_b"))
    )
    s = j.groupBy("type_a", "type_b").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n_days") * F.col("syy") - F.col("sy") * F.col("sy")
    base = s.select(
        "type_a", "type_b", "n_days",
        num.cast("long").alias("corr_num"),
        vx.cast("long").alias("var_x"),
        vy.cast("long").alias("var_y"),
        F.signum(num).cast("long").alias("corr_sign"),
    )
    return base.withColumn(
        "corr2_ppm",
        F.when(
            (F.col("var_x") > 0) & (F.col("var_y") > 0),
            F.expr(
                f"(abs(corr_num) * {scale} div var_x)"
                " * abs(corr_num) div var_y"
            ),
        ).otherwise(F.lit(0)).cast("long"),
    )


def value_deciles(events: DataFrame) -> DataFrame:
    """Exact user-value deciles + gain curve WITHOUT a global sort — the
    scale-safe ntile construction (a naive ntile(10) OVER (ORDER BY
    value) plans a single-partition global sort, the one window shape
    this engine bans): per user the exact integer cent total, then the
    user's global rank under (value DESC, user_id ASC) decomposed as
    cum_users_of_strictly_larger_values (ONE window over the BOUNDED
    value histogram) + row_number within the user's own value group
    (a value-partitioned window) — identical to the global-sort rank,
    never materializing a global order. decile = (rank-1)*10 div N.
    Emits per decile: users, cent total, exact share_ppm and cumulative
    share — the lift/gain table a spend-concentration dashboard reads
    ("the top decile carries X% of value").

    Scale shape (round-6): one user-keyed aggregate (the event store's
    native sharding), one histogram aggregate over DISTINCT cent totals.
    Distinct user totals approach the user count at scale (cent sums are
    nearly unique), so the histogram prefix sum is NOT run as a global
    single-partition window: the histogram is range-partitioned by
    (v DESC) — Spark's sampled range exchange, the same machinery a
    global sort uses, equal keys never split — the running count is a
    per-range-partition window, and the cross-partition offset is an
    exclusive prefix over the <= shuffle-partitions-row partition-total
    table (the packing.py two-level pattern; AQE may coalesce adjacent
    ranges, which keeps pid monotone in v so the offsets stay exact).
    cum_before is boundary-placement-independent, hence deterministic.
    Then the value-partitioned row_number, a value-keyed equi-join back,
    one 10-row aggregate."""
    from pyspark.sql import Window

    from unsupervised_ner_spark.caching import scoped_persist

    cents = F.round(F.col("value") * 100).cast("long")
    users = events.groupBy("user_id").agg(
        F.sum(cents).cast("long").alias("v")
    )
    nparts = int(events.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    hist = scoped_persist(
        users.groupBy("v").agg(F.count("*").cast("long").alias("n_at"))
        .repartitionByRange(nparts, F.desc("v"))
        .withColumn("pid", F.spark_partition_id().cast("long"))
    )
    wp = Window.partitionBy("pid").orderBy(F.desc("v")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # partition totals: bounded by the shuffle partition count, the
    # documented single-partition window over a BOUNDED table
    wo = Window.orderBy(F.asc("pid")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = (
        hist.groupBy("pid").agg(F.sum("n_at").cast("long").alias("p_n"))
        .select(
            "pid",
            F.coalesce(F.sum("p_n").over(wo), F.lit(0))
            .cast("long").alias("p_off"),
        )
    )
    tot_users = hist.agg(F.sum("n_at").cast("long").alias("n_total"))
    cums = (
        hist.withColumn("in_part_cum", F.sum("n_at").over(wp))
        .join(F.broadcast(offs), "pid")
        .crossJoin(F.broadcast(tot_users))
        .select(
            "v",
            (F.col("p_off") + F.col("in_part_cum") - F.col("n_at"))
            .cast("long").alias("cum_before"),
            "n_total",
        )
    )
    wv = Window.partitionBy("v").orderBy("user_id")
    ranked = users.join(cums, "v").select(
        "user_id", "v",
        (F.col("cum_before") + F.row_number().over(wv)).alias("rank"),
        "n_total",
    )
    tot = users.agg(F.sum("v").cast("long").alias("total_cents"))
    dec = ranked.select(
        "v",
        F.expr("(rank - 1) * 10 div n_total").cast("long").alias("decile"),
    )
    per = dec.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("v").cast("long").alias("sum_cents"),
    )
    wd = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "decile", "n_users", "sum_cents",
            F.expr("sum_cents * 1000000 div total_cents").cast("long")
            .alias("share_ppm"),
        )
        .withColumn(
            "cum_share_ppm",
            F.sum("share_ppm").over(wd).cast("long"),
        )
    )


def interarrival(events: DataFrame) -> DataFrame:
    """Inter-arrival cadence per event type — the burstiness diagnostic
    beside late_events (delay sizing) and cusum_changepoint (rate
    bends): consecutive gaps are measured per (user, type) stream (the
    cadence a session/watermark policy actually faces), then per type
    the exact discrete median, p90, and max gap in microseconds via the
    rank-at-ceil device (rel_outliers precedent — rank over the value
    itself, so equal values make the picked value deterministic with no
    tie-break column).

    Scale shape: one lag window on the (user, type) native sharding, one
    type-partitioned rank window over the gap rows (the event store's
    own key — never a global sort), one bounded aggregate."""
    from pyspark.sql import Window

    wl = Window.partitionBy("user_id", "event_type").orderBy(
        F.unix_micros(F.col("ts").cast("timestamp")), "event_id"
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = (
        events.select(
            "user_id", "event_type", us.alias("t_us"), "event_id",
            F.lag(us).over(wl).alias("prev_us"),
        )
        .filter(F.col("prev_us").isNotNull())
        .select(
            "event_type",
            (F.col("t_us") - F.col("prev_us")).cast("long").alias("gap_us"),
        )
    )
    wr = Window.partitionBy("event_type").orderBy("gap_us")
    r = gaps.select(
        "event_type", "gap_us",
        F.row_number().over(wr).cast("long").alias("rn"),
        F.count("*").over(Window.partitionBy("event_type"))
        .cast("long").alias("n"),
    )
    med = F.expr("(n * 50 + 99) div 100")
    p90 = F.expr("(n * 90 + 99) div 100")
    return r.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_gaps"),
        F.max(F.when(F.col("rn") == med, F.col("gap_us")))
        .cast("long").alias("med_gap_us"),
        F.max(F.when(F.col("rn") == p90, F.col("gap_us")))
        .cast("long").alias("p90_gap_us"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
    )


def weekday_profile(events: DataFrame) -> DataFrame:
    """Day-of-week seasonality profile per event type — the weekly-cycle
    read beside trend_ols (drift) and cusum_changepoint (bends): counts
    per (type, weekday) with the exact integer uniformity deviation
    dev = 7*c - total (zero everywhere iff perfectly uniform; the
    chi-square numerator's signed root) and exact share_ppm. The weekday
    index is pure epoch-day arithmetic — (day + 3) mod 7 with Monday=0,
    anchored on 1970-01-01 being a Thursday — NEVER an engine dayofweek()
    builtin (locale/week-start semantics differ across engines; integer
    arithmetic does not).

    Scale shape: one narrow map into ONE (type x 7)-bounded aggregate,
    share against the broadcast type total."""
    day = F.datediff(F.col("ts"), F.lit("1970-01-01").cast("date")).cast("long")
    ev = events.select(
        "event_type", F.pmod(day + 3, F.lit(7)).cast("long").alias("dow")
    )
    hist = ev.groupBy("event_type", "dow").agg(
        F.count("*").cast("long").alias("n_events")
    )
    tot = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_total")
    )
    return hist.join(F.broadcast(tot), "event_type").select(
        "event_type", "dow", "n_events",
        (F.lit(7) * F.col("n_events") - F.col("n_total"))
        .cast("long").alias("dev_7c_total"),
        F.expr("n_events * 1000000 div n_total").cast("long")
        .alias("share_ppm"),
    )


def calendar_gap_fill(events: DataFrame) -> DataFrame:
    """Calendar densification — the zero-filling step every daily time
    series consumer (trend_ols, cusum_changepoint, dashboard sparklines)
    silently assumes and raw event aggregates never provide: per event
    type, every day in [min observed day, max observed day] appears
    exactly once, days with no events carry n_events = 0 and
    is_filled = 1. Day = epoch-day integer (datediff vs 1970-01-01), the
    weekday_profile convention — never an engine date-truncation builtin.

    Scale shape: ONE event-sized map-side-combining (type, day) aggregate
    is the only pass over the data; the per-type [lo, hi] range and the
    exploded calendar are DIMENSION-sized (types x day span — a 10-year
    daily calendar is 3,653 rows per type), so the fill join is a
    bounded-table left join, never an event-table operation."""
    day = F.datediff(F.col("ts"), F.lit("1970-01-01").cast("date")).cast("long")
    counts = events.select("event_type", day.alias("day")).groupBy(
        "event_type", "day"
    ).agg(F.count("*").cast("long").alias("n"))
    cal = (
        counts.groupBy("event_type")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day"),
        )
    )
    return cal.join(counts, ["event_type", "day"], "left").select(
        "event_type",
        F.col("day").cast("long").alias("day"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        F.when(F.col("n").isNull(), 1).otherwise(0)
        .cast("long").alias("is_filled"),
    )


def hopping_window_counts(events: DataFrame, width_days: int = 7) -> DataFrame:
    """Hopping (sliding) window aggregation — the batch twin of a
    streaming ``window(ts, '7 days', '1 day')``: per event type and
    window start day, the event count and the exact distinct-user count
    over the ``width_days``-day window [start, start + width). Sizing
    read for watermaring/triggers beside rel_late_events: how bursty is
    a week-long window vs its daily hop.

    Scale shape: each event expression-side-explodes into exactly
    ``width_days`` covering window starts (never a self-join or a range
    join — the O(|E| x days) trap); the distinct-user count is TWO
    stacked map-side-combining aggregates ((type, start, user) then
    (type, start)), the token-entropy device, so no count-distinct
    shuffle of raw events and no window function anywhere."""
    w = int(width_days)
    day = F.datediff(F.col("ts"), F.lit("1970-01-01").cast("date")).cast("long")
    per_user = (
        events.select("event_type", "user_id", day.alias("day"))
        .select(
            "event_type",
            "user_id",
            F.explode(
                F.sequence(F.col("day") - F.lit(w - 1), F.col("day"))
            ).alias("win_start_day"),
        )
        .groupBy("event_type", "win_start_day", "user_id")
        .agg(F.count("*").cast("long").alias("n"))
    )
    return per_user.groupBy("event_type", "win_start_day").agg(
        F.sum("n").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_users"),
    ).select(
        "event_type",
        F.col("win_start_day").cast("long").alias("win_start_day"),
        "n_events",
        "n_users",
    )


def sequence_patterns(events: DataFrame) -> DataFrame:
    """Sequential-pattern support mining — the length-2 core of GSP /
    SPADE (Srikant & Agrawal EDBT'96): for every ordered event-type pair
    (antecedent, consequent), the number of users whose stream contains
    SOME antecedent occurrence strictly before SOME consequent
    occurrence. Gap-tolerant "A then B" — the complement of
    ``event_transitions``' adjacent-bigram matrix, which cannot see
    A..X..B. Repeat patterns (A then A) fire when a user has two
    antecedent occurrences at distinct timestamps.

    The existence test folds to sufficient statistics: a user supports
    (a, b) iff min_ts(a) < max_ts(b) — strictly, so equal-timestamp
    pairs never count and tie-handling is deterministic. Confidence =
    support / users(antecedent) in exact ppm; lift vs the independence
    baseline as ``(confidence_ppm * n_users_total) div n_users_cons`` —
    that evaluation order is part of the contract (confidence_ppm <=
    10^6, so the product stays under 10^15 even at 10^9 users; the
    full-precision numerator would overflow) and the oracle replays it
    verbatim.

    Scale shape: ONE event-sized aggregate to (user, type, first, last)
    — map-side combining, output bounded by users x alphabet — then a
    user-keyed equi-join of two alphabet-bounded projections of that
    persisted table, two bounded aggregates, and broadcast joins of the
    per-type user counts plus a one-row total. The raw stream shuffles
    exactly once."""
    from unsupervised_ner_spark.caching import scoped_persist

    us = F.unix_micros(F.col("ts").cast("timestamp"))
    per = scoped_persist(
        events.groupBy("user_id", "event_type").agg(
            F.min(us).alias("first_us"), F.max(us).alias("last_us"),
        )
    )
    tot = per.select(
        F.countDistinct("user_id").cast("long").alias("n_users_total")
    )
    type_users = per.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_users_type")
    )
    a = per.select(
        "user_id", F.col("event_type").alias("antecedent"),
        F.col("first_us").alias("a_first"),
    )
    b = per.select(
        "user_id", F.col("event_type").alias("consequent"),
        F.col("last_us").alias("b_last"),
    )
    supp = (
        a.join(b, "user_id")
        .filter(F.col("a_first") < F.col("b_last"))
        .groupBy("antecedent", "consequent")
        .agg(F.count("*").cast("long").alias("n_users"))
    )
    ta = type_users.select(
        F.col("event_type").alias("antecedent"),
        F.col("n_users_type").alias("n_users_ant"),
    )
    tb = type_users.select(
        F.col("event_type").alias("consequent"),
        F.col("n_users_type").alias("n_users_cons"),
    )
    return (
        supp.join(F.broadcast(ta), "antecedent")
        .join(F.broadcast(tb), "consequent")
        .crossJoin(F.broadcast(tot))
        .select(
            "antecedent", "consequent", "n_users",
            "n_users_ant", "n_users_cons", "n_users_total",
            F.expr("n_users * 1000000 div n_users_ant")
            .cast("long").alias("confidence_ppm"),
            F.expr(
                "(n_users * 1000000 div n_users_ant) * n_users_total"
                " div n_users_cons"
            ).cast("long").alias("lift_ppm"),
        )
    )


def rate_anomaly(
    events: DataFrame,
    window_days: int = 7,
    num: int = 5,
    den: int = 4,
    min_prior_days: int = 3,
) -> DataFrame:
    """Trailing-window rate anomaly — the per-day monitor beside
    cusum_changepoint's single global bend: a (type, day) is anomalous
    when its count exceeds num/den of the trailing ``window_days``-day
    average, tested by exact cross-multiplication
    (``n * n_prior * den > num * prior_sum`` — no float ever), with a
    cold-start flag for days carrying fewer than ``min_prior_days``
    observed trailing days (a threshold on 1-2 noisy days is not a
    signal). The trailing frame is RANGE-based on the day number, so
    calendar gaps shrink the baseline instead of silently stretching it
    across months (the ROWS-frame trap).

    Scale shape: ONE event-sized aggregate with map-side combining;
    the window runs on the bounded (type, day) table partitioned by
    type — never over raw events."""
    from pyspark.sql import Window

    day = F.datediff(
        F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    daily = events.groupBy(
        "event_type", day.alias("day")
    ).agg(F.count("*").cast("long").alias("n_events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rangeBetween(-window_days, -1)
    )
    stats = daily.select(
        "event_type", "day", "n_events",
        F.coalesce(F.sum("n_events").over(w), F.lit(0))
        .cast("long").alias("prior_sum"),
        F.count("*").over(w).cast("long").alias("n_prior_days"),
    )
    hot = (
        F.col("n_events") * F.col("n_prior_days") * F.lit(den)
        > F.lit(num) * F.col("prior_sum")
    )
    cold = F.col("n_prior_days") < min_prior_days
    return stats.select(
        "event_type", "day", "n_events", "prior_sum", "n_prior_days",
        F.when(~cold & hot, F.lit(1)).otherwise(F.lit(0))
        .cast("long").alias("is_anomaly"),
        F.when(cold, F.lit(1)).otherwise(F.lit(0))
        .cast("long").alias("is_coldstart"),
    )


def decay_score(
    events: DataFrame, half_life_days: int = 7, max_halvings: int = 62
) -> DataFrame:
    """Exponential time-decay engagement score per user — the
    feature-store staple (recency-weighted activity) computed with
    EXACT integers: each event contributes round(value * 100) cents
    halved once per whole ``half_life_days`` of age relative to the
    stream's global max day (integer ``div 2^k``; fractional-power
    float decay never crosses engines bit-identically). Halvings clamp
    at ``max_halvings`` (the int64 shift ceiling; older events
    contribute their floor, typically 0). Output per user: decayed
    score, raw cents, event count, days since last activity.

    Scale shape: a one-row global max-day broadcast onto the stream
    (no window), then ONE event-sized aggregate with map-side
    combining."""
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    mx = events.agg(F.max(day).cast("long").alias("max_day"))
    cents = F.round(F.col("value") * 100, 0).cast("long")
    contrib = (
        events.select("user_id", day.alias("day"), cents.alias("cents"))
        .crossJoin(F.broadcast(mx))
        .select(
            "user_id", "cents", "day", "max_day",
            F.expr(
                "cents div shiftleft(CAST(1 AS BIGINT), "
                f"CAST(least((max_day - day) div {int(half_life_days)}, "
                f"{int(max_halvings)}) AS INT))"
            ).cast("long").alias("decayed"),
        )
    )
    return contrib.groupBy("user_id").agg(
        F.sum("decayed").cast("long").alias("decayed_cents"),
        F.sum("cents").cast("long").alias("raw_cents"),
        F.count("*").cast("long").alias("n_events"),
        (F.max("max_day") - F.max("day")).cast("long")
        .alias("days_since_last"),
    )


def touch_attribution(
    events: DataFrame,
    touch_types: Sequence[str] = ("view", "click"),
    conversion: str = "purchase",
) -> DataFrame:
    """Marketing-style conversion attribution over the event stream — the
    growth-analytics primitive the funnel does not answer: WHICH channel
    gets credit for each conversion. Per user (ordered by the tz-free
    (unix_micros, event_id) total order), every ``conversion`` event is
    attributed twice: to the LAST preceding touch (``touch_types`` row —
    the performance-marketing model) and to the FIRST preceding touch
    (the brand model); conversions with no preceding touch credit the
    'direct' channel. Output is the long-format credit table, one row
    per (model, channel): conversions, exact cents credited, and the
    summed touch->conversion lag in microseconds (0 for direct rows —
    gaps, not epochs, cross engines; the funnel precedent).

    Scale shape: ONE pass — a per-user window (the event store's natural
    partitioning; a hot user is one window partition, the same exposure
    every per-user analytic has), a 2-element explode, and one bounded
    map-side-combining aggregate (<= 2 models x channels+1 rows). No
    join, no second event-sized shuffle."""
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    is_touch = F.col("event_type").isin(*touch_types)
    st = events.select(
        "user_id", "event_type", t.alias("t"),
        F.col("event_id").cast("long").alias("eid"),
        F.when(is_touch, F.col("event_type")).alias("touch"),
        F.when(is_touch, t).alias("touch_t"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "eid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    conv = (
        st.select(
            "user_id", "event_type", "t", "cents",
            F.last("touch", ignorenulls=True).over(w).alias("last_ch"),
            F.last("touch_t", ignorenulls=True).over(w).alias("last_t"),
            F.first("touch", ignorenulls=True).over(w).alias("first_ch"),
            F.first("touch_t", ignorenulls=True).over(w).alias("first_t"),
        )
        .filter(F.col("event_type") == conversion)
    )
    credit = conv.select(
        "cents",
        F.explode(
            F.array(
                F.struct(
                    F.lit("last_touch").alias("model"),
                    F.coalesce("last_ch", F.lit("direct")).alias("channel"),
                    F.coalesce(F.col("t") - F.col("last_t"), F.lit(0))
                    .cast("long").alias("lag_us"),
                ),
                F.struct(
                    F.lit("first_touch").alias("model"),
                    F.coalesce("first_ch", F.lit("direct")).alias("channel"),
                    F.coalesce(F.col("t") - F.col("first_t"), F.lit(0))
                    .cast("long").alias("lag_us"),
                ),
            )
        ).alias("c"),
    )
    return credit.groupBy(
        F.col("c.model").alias("model"), F.col("c.channel").alias("channel")
    ).agg(
        F.count("*").cast("long").alias("n_conversions"),
        F.sum("cents").cast("long").alias("cents"),
        F.sum("c.lag_us").cast("long").alias("sum_lag_us"),
    )


def debounce(
    events: DataFrame, threshold_us: int = 6 * 3600 * 1_000_000
) -> DataFrame:
    """Burst-collapse (debounce) of the event stream — the telemetry
    dedup the exact-duplicate pass cannot do: repeated (user, type)
    events separated by less than ``threshold_us`` collapse into one
    burst island (gaps-and-islands: a new island starts where the gap
    from the previous same-key event exceeds the threshold, or at the
    key's first event). One row per island: 1-based island index,
    events collapsed, intra-island span, and the lead gap from the
    previous island's end (-1 for the key's first island) — all
    microsecond DIFFERENCES, never absolute epochs (the asof timezone
    rule).

    Scale shape: one window pass keyed (user_id, event_type) — the
    event store's natural partitioning — building the running island
    index, ONE map-side-combining aggregate into the island table
    (bounded above by the event count, typically far smaller), and one
    window over that bounded table for the lead gap. No join."""
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    key = ["user_id", "event_type"]
    wo = Window.partitionBy(*key).orderBy("t", "eid")
    ev = events.select(
        "user_id", "event_type", t.alias("t"),
        F.col("event_id").cast("long").alias("eid"),
    )
    flagged = ev.select(
        *key, "t",
        F.when(
            (F.col("t") - F.lag("t").over(wo)) <= F.lit(int(threshold_us)),
            F.lit(0),
        ).otherwise(F.lit(1)).alias("is_start"),
        F.col("eid"),
    )
    wrun = (
        Window.partitionBy(*key)
        .orderBy("t", "eid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = (
        flagged.select(
            *key, "t",
            F.sum("is_start").over(wrun).cast("long").alias("island_idx"),
        )
        .groupBy(*key, "island_idx")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            (F.max("t") - F.min("t")).cast("long").alias("span_us"),
            F.min("t").alias("_start"),
            F.max("t").alias("_end"),
        )
    )
    wi = Window.partitionBy(*key).orderBy("island_idx")
    return islands.select(
        *key, "island_idx", "n_events", "span_us",
        F.coalesce(
            F.col("_start") - F.lag("_end").over(wi), F.lit(-1)
        ).cast("long").alias("lead_gap_us"),
    )


def activity_streaks(events: DataFrame) -> DataFrame:
    """Consecutive-day activity streaks per user — the engagement
    primitive between retention (weekly cohorts) and debounce
    (sub-day bursts): distinct active days collapse into maximal runs
    of consecutive days; per user the active-day total, streak count,
    the LONGEST streak (ties -> earliest start), and the length of the
    final streak (the one containing the user's last active day).
    Days are tz-free epoch-day integers (the retention device).

    Scale shape: one map-side-combining distinct-day aggregate, one
    lag + running-sum window pair per user (partitions bounded by a
    user's active-day count), one island aggregate, one per-user
    aggregate. No join."""
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    days = (
        events.select("user_id", day.alias("day"))
        .groupBy("user_id", "day")
        .agg(F.count("*").alias("_n"))
        .drop("_n")
    )
    wo = Window.partitionBy("user_id").orderBy("day")
    marked = days.select(
        "user_id", "day",
        F.when(
            (F.col("day") - F.lag("day").over(wo)) == 1, F.lit(0)
        ).otherwise(F.lit(1)).cast("long").alias("new_streak"),
    )
    runs = marked.select(
        "user_id", "day",
        F.sum("new_streak").over(
            wo.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long").alias("streak_idx"),
    )
    islands = runs.groupBy("user_id", "streak_idx").agg(
        F.count("*").cast("long").alias("len"),
        F.min("day").cast("long").alias("start_day"),
    )
    return islands.groupBy("user_id").agg(
        F.sum("len").cast("long").alias("n_active_days"),
        F.count("*").cast("long").alias("n_streaks"),
        F.min(F.struct((-F.col("len")).alias("nl"), "start_day"))
        .getField("nl").cast("long").alias("_neg_longest"),
        F.min(F.struct((-F.col("len")).alias("nl"), "start_day"))
        .getField("start_day").cast("long").alias("longest_start_day"),
        F.max(F.struct("start_day", "len")).getField("len")
        .cast("long").alias("last_streak_len"),
    ).select(
        "user_id", "n_active_days", "n_streaks",
        (-F.col("_neg_longest")).cast("long").alias("longest_len"),
        "longest_start_day", "last_streak_len",
    )


def wow_change(events: DataFrame) -> DataFrame:
    """Week-over-week change per event type — the dashboard layer above
    rel_trend (direction) and rel_changepoint (bend): weekly counts
    (tz-free epoch-day div 7, the retention device), previous-week lag,
    exact delta, and the exact ppm change (n-prev)*1e6 div prev. The
    type's FIRST week has no baseline: is_first=1 with prev/delta/ppm
    pinned to 0 (sentinels, not NULLs — the gate hashes integers).

    Scale shape: ONE event-sized map-side-combining (type, week)
    aggregate; the lag window runs over the bounded weekly table. Weeks
    with zero events are absent by construction (their ppm against the
    next active week is still exact); compose with calendar_gap_fill
    when a dense weekly axis is wanted."""
    week = F.expr(
        "CAST(datediff(CAST(ts AS DATE), DATE'1970-01-01') AS BIGINT) div 7"
    )
    weekly = (
        events.select("event_type", week.alias("week"))
        .groupBy("event_type", "week")
        .agg(F.count("*").cast("long").alias("n"))
    )
    wt = Window.partitionBy("event_type").orderBy("week")
    step = weekly.select(
        "event_type", "week", "n", F.lag("n").over(wt).alias("prev"),
    )
    return step.select(
        "event_type", "week", "n",
        F.coalesce("prev", F.lit(0)).cast("long").alias("prev_n"),
        F.coalesce(F.col("n") - F.col("prev"), F.lit(0)).cast("long")
        .alias("delta"),
        F.coalesce(
            F.expr("(n - prev) * 1000000 div prev"), F.lit(0)
        ).cast("long").alias("change_ppm"),
        F.when(F.col("prev").isNull(), F.lit(1)).otherwise(F.lit(0))
        .cast("long").alias("is_first"),
    )


# Benford first-digit probabilities log10(1 + 1/d), floored to ppm —
# public constants, identical literals on both engines
BENFORD_PPM = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910,
    5: 79181, 6: 66946, 7: 57991, 8: 51152, 9: 45757,
}


def benford_audit(events: DataFrame) -> DataFrame:
    """Benford's-law first-digit audit per event type — the
    data-quality / fraud screen (Nigrini 2012): naturally-occurring
    multi-magnitude amounts follow P(d) = log10(1 + 1/d); fabricated or
    truncated feeds do not. Per (event_type, first digit of the cents
    amount): observed count, exact observed ppm, the Benford ppm (the
    fixed public constants above — no log evaluated in either engine),
    and the absolute deviation; plus the per-type L1 deviation total on
    every row (the ranking signal — flat-distribution types score
    ~340k ppm). Zero-cent rows have no leading digit and are excluded.

    Scale shape: first digit = an integer magnitude ladder (no string
    round-trip, no log): cents div 10^(#digits-1) via the bounded
    power-of-ten CASE; ONE event-sized map-side-combining aggregate
    onto the <= types x 9 table, then bounded windows."""
    from pyspark.sql import Window

    cents = F.round(F.col("value") * 100, 0).cast("long")
    # magnitude ladder: largest power of ten <= cents (cents <= ~1e17)
    pow_expr = "CASE " + " ".join(
        f"WHEN cents >= {10 ** k} THEN CAST({10 ** k} AS BIGINT)"
        for k in range(17, 0, -1)
    ) + " ELSE 1 END"
    digits = (
        events.select("event_type", cents.alias("cents"))
        .filter(F.col("cents") > 0)
        .select(
            "event_type",
            F.expr(f"cents div ({pow_expr})").cast("long").alias("digit"),
        )
    )
    counts = digits.groupBy("event_type", "digit").agg(
        F.count("*").cast("long").alias("n")
    )
    bppm = F.element_at(
        F.array(*[F.lit(BENFORD_PPM[d]) for d in range(1, 10)]),
        F.col("digit").cast("int"),
    ).cast("long")
    wt = Window.partitionBy("event_type")
    scored = counts.select(
        "event_type", "digit", "n",
        F.expr("n * 1000000").alias("_num"),
        F.sum("n").over(wt).cast("long").alias("_tot"),
        bppm.alias("benford_ppm"),
    ).select(
        "event_type", "digit", "n", "benford_ppm",
        F.expr("_num div _tot").cast("long").alias("obs_ppm"),
        F.col("_tot").alias("_tot"),
    ).select(
        "event_type", "digit", "n", "obs_ppm", "benford_ppm",
        F.abs(F.col("obs_ppm") - F.col("benford_ppm")).cast("long")
        .alias("abs_dev_ppm"),
    )
    return scored.select(
        "event_type", "digit", "n", "obs_ppm", "benford_ppm",
        "abs_dev_ppm",
        F.sum("abs_dev_ppm").over(wt).cast("long").alias("l1_dev_ppm"),
    )
