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
