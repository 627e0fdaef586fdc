"""Cardinality sketches: deterministic HyperLogLog registers.

The canonical 100 TB counting problem — "how many distinct tokens / urls /
entities does this corpus have?" — cannot afford the exact answer's
shuffle (the distinct universe IS the data). HyperLogLog (Flajolet et al.
2007) replaces it with a fixed-size register table: hash every value, use
a hash prefix as the register index, and keep per register the maximum
number of leading zero bits (+1) of the hash suffix. Registers merge by
element-wise max, so the whole computation is one map-side-combining
aggregate whose shuffle is bounded by (#groups x #registers), independent
of corpus size — the same reason Spark's own approx_count_distinct (a
HLL++ variant) scales. We build the registers explicitly rather than
calling the built-in so the sketch is (a) mergeable/persistable as a
first-class table — the incremental-corpus posture: yesterday's registers
max-merge with today's — and (b) bit-for-bit replayable by the DuckDB
oracle.

Cross-engine determinism (the sampling-ops precedent): both engines share
md5 over strings but not an efficient hex->int conversion, so everything
is derived from the md5 HEX string. The register index is the first
``p_hex`` hex chars (kept AS a string key); rho comes from the
leading-'0' run of the next 12 hex chars (48 bits): each leading '0' hex
char contributes 4 zero bits, and the first non-zero hex digit
contributes its own 4 - bit_length(digit) zeros via a 4-case digit-class
map. Both sides compute the identical integers; the float estimate is a
derived, never-hashed column (the NPMI/dedup_jaccard precedent).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2 hex chars -> 256 registers per group: ~6.5% standard error, plenty for
# corpus-level cardinality tiers; bump to 3 (4096 registers) for 1.6%.
P_HEX = 2
SUFFIX_HEX = 12  # 48 bits of rho evidence; rho in [1, 49]


def _rho_from_suffix(s: Column) -> Column:
    """rho = (# leading zero BITS of the 48-bit hex suffix) + 1, computed
    over the hex string: 4 bits per leading '0' char, then 3/2/1/0 extra
    zeros for first non-zero digit 1 / 2-3 / 4-7 / 8-f."""
    lz_hex = F.length(F.regexp_extract(s, "^0*", 0))
    first_nz = s.substr(lz_hex + F.lit(1), F.lit(1))
    extra = (
        F.when(first_nz == "1", 3)
        .when(first_nz.isin("2", "3"), 2)
        .when(first_nz.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    all_zero_rho = F.lit(4 * SUFFIX_HEX + 1)
    return (
        F.when(lz_hex == SUFFIX_HEX, all_zero_rho)
        .otherwise(lz_hex * 4 + extra + 1)
        .cast("long")
    )


def hll_registers(values: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """HLL register table for count-distinct of ``value_col`` per group:
    (group_cols..., bucket hex-string, r_max).

    Duplicate values hash identically, so max(rho) over OCCURRENCES equals
    max over the distinct set — no pre-distinct needed; the aggregate's
    partial (map-side) combine does all the work and the shuffle carries
    at most #groups x 16^P_HEX rows per map partition."""
    h = F.md5(F.col(value_col).cast("string"))
    reg = values.select(
        *group_cols,
        F.substring(h, 1, P_HEX).alias("bucket"),
        _rho_from_suffix(F.substring(h, P_HEX + 1, SUFFIX_HEX)).alias("rho"),
    )
    return reg.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("r_max"))


def merge_registers(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Element-wise max-merge of two register tables — the incremental
    posture: sketch today's partition, merge with the running sketch."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("r_max").alias("r_max"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Derived float estimate from a register table (never hashed).

    Standard HLL: E = alpha_m * m^2 / sum_j 2^(-M_j) with absent registers
    counting M_j = 0, plus the small-range linear-counting correction
    E <= 2.5m with empty registers present: m * ln(m / V)."""
    m = 16**P_HEX
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("r_max"))).alias("sum_pow"),
        F.count("*").alias("n_present"),
    )
    # absent buckets contribute 2^0 = 1 each
    zeros = F.lit(m) - F.col("n_present")
    raw = F.lit(alpha * m * m) / (F.col("sum_pow") + zeros.cast("double"))
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(*group_cols, est.alias("estimate"))


def hll_error_bound(confidence_sigmas: float = 3.0) -> float:
    """Relative standard error 1.04/sqrt(m), scaled."""
    return confidence_sigmas * 1.04 / math.sqrt(16**P_HEX)


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------
# The bounded-memory frequency companion to HLL: d independent hash rows x
# w counters answer "how often does x occur?" with one-sided error
# (estimate >= truth, overshoot <= eps * N with prob 1 - delta). At 100 TB
# the exact per-token count table IS the vocabulary (fine) but per-(source,
# token) or per-(hour, token) frequency tables explode combinatorially —
# the sketch caps them at d x w counters per group. Counters merge by
# element-wise SUM (the register analogue of HLL's max), so incremental
# corpora just add their sketches.
#
# Determinism: row i hashes x with md5(i || ':' || x); the counter index is
# the first 3 hex chars kept AS a string (4096 columns/row, the sampling-ops
# precedent). Integer counters only — gate-safe by construction.

CMS_DEPTH = 4
CMS_WIDTH_HEX = 3  # 3 hex chars -> 4096 counters per row


def _cms_bucket(row_idx: Column, value: Column) -> Column:
    return F.substring(
        F.md5(F.concat(row_idx.cast("string"), F.lit(":"), value.cast("string"))),
        1,
        CMS_WIDTH_HEX,
    )


def cms_counters(values: DataFrame, value_col: str) -> DataFrame:
    """CMS counter table (row_idx, bucket, cnt) over occurrences of
    ``value_col``: one posexplode into the d rows (narrow, d x input) and
    one map-side-combining count aggregate bounded by d x 16^3 = 16,384
    cells — the shuffle never carries the value universe."""
    rows = values.select(
        F.posexplode(
            F.array(
                *[
                    _cms_bucket(F.lit(i), F.col(value_col))
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("pos", "bucket")
    ).select(F.col("pos").cast("long").alias("row_idx"), "bucket")
    return rows.groupBy("row_idx", "bucket").agg(
        F.count("*").cast("long").alias("cnt")
    )


def cms_estimate(cms: DataFrame, queries: DataFrame, value_col: str) -> DataFrame:
    """Point-frequency estimates: min over the d rows of the counter each
    query hashes to. The query side is small (the items you ask about) and
    broadcasts; absent cells are exact zeros."""
    probes = queries.select(
        value_col,
        F.posexplode(
            F.array(
                *[
                    _cms_bucket(F.lit(i), F.col(value_col))
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("row_idx", "bucket"),
    ).select(value_col, F.col("row_idx").cast("long").alias("row_idx"), "bucket")
    joined = cms.join(F.broadcast(probes), ["row_idx", "bucket"], "right").na.fill(
        {"cnt": 0}
    )
    return joined.groupBy(value_col).agg(F.min("cnt").cast("long").alias("est"))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Element-wise sum-merge of two counter tables."""
    return (
        a.unionByName(b)
        .groupBy("row_idx", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970)
# ---------------------------------------------------------------------------
# The membership third of the sketch family (HLL = cardinality, CMS =
# frequency): k hash rows over an m-position bit space answer "might x be
# in the set?" with no false negatives and a deterministic false-positive
# set. The 100 TB use is the PRE-FILTER: before an expensive anti-join of
# an incoming crawl against a billions-row seen-set, broadcast the seen-
# set's bloom bits (m bits, not the set) and drop definite-misses map-side
# — the big side never shuffles for rows the filter can already clear.
# Spark's own Runtime Row-Level Filtering injects exactly this shape; we
# build it explicitly so the bits are a persistable, mergeable (OR) table
# the DuckDB oracle replays bit-for-bit.
#
# Determinism: row i's position for x is the first 4 hex chars of
# md5(i || ':' || x) kept AS a string — 65,536 positions per row, the
# sampling-ops precedent. False positives are a deterministic function of
# md5, so both engines flag the identical candidate set.

BLOOM_K = 4
BLOOM_POS_HEX = 4  # 4 hex chars -> 65,536 positions per hash row


def _bloom_pos(row_idx: Column, value: Column) -> Column:
    return F.substring(
        F.md5(F.concat(row_idx.cast("string"), F.lit(":"), value.cast("string"))),
        1,
        BLOOM_POS_HEX,
    )


def bloom_bits(values: DataFrame, value_col: str) -> DataFrame:
    """Set-bit table (row_idx, pos) for the membership set: one posexplode
    into the k rows + one distinct bounded by k x 65,536 cells. Merge two
    blooms by unioning their bit tables (set OR)."""
    return (
        values.select(
            F.posexplode(
                F.array(
                    *[
                        _bloom_pos(F.lit(i), F.col(value_col))
                        for i in range(BLOOM_K)
                    ]
                )
            ).alias("pos_idx", "pos")
        )
        .select(F.col("pos_idx").cast("long").alias("row_idx"), "pos")
        .distinct()
    )


def bloom_maybe_contains(
    probes: DataFrame, bits: DataFrame, value_col: str
) -> DataFrame:
    """Rows of ``probes`` whose value hits set bits in ALL k rows — the
    maybe-members (supersets the true members; no false negatives).

    Plan shape: the bits table is bounded (<= k x 65,536 rows) and
    broadcasts; each probe expands to its k (row_idx, pos) cells, joins
    the broadcast bits, and survives iff all k matched — the probe side
    is filtered without a shuffle against the seen-SET (only the k-row
    per-probe count aggregate exchanges, keyed on the probe)."""
    cells = probes.select(
        value_col,
        F.posexplode(
            F.array(
                *[
                    _bloom_pos(F.lit(i), F.col(value_col))
                    for i in range(BLOOM_K)
                ]
            )
        ).alias("pos_idx", "pos"),
    ).select(value_col, F.col("pos_idx").cast("long").alias("row_idx"), "pos")
    hits = cells.join(F.broadcast(bits), ["row_idx", "pos"], "inner")
    return (
        hits.groupBy(value_col)
        .agg(F.count("*").cast("long").alias("n_hits"))
        .filter(F.col("n_hits") == BLOOM_K)
        .select(value_col)
    )


def kmv_registers(
    values: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    prune_at: int = 4096,
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch registers — the other
    classic mergeable distinct sketch next to HLL (Bar-Yossef et al.
    2002; DataSketches' theta family): per group the ``k`` smallest
    md5(value) hashes, from which |D| ≈ (k-1) / max_kth_hash_fraction is
    estimated downstream (the float estimate never enters the hashed
    surface — registers are the sufficient statistic, and two register
    sets MERGE by union + re-top-k, which is what a 100 TB tree
    aggregation does).

    Scale shape: the naive plan ranks EVERY distinct hash inside one
    per-group window partition — vocabulary-sized, the hot-partition trap.
    The pruning rule: with n distinct values, only hashes with ``p`` =
    (bit_length(n div 4096) - 1) div 4 leading hex zeros (16^p <= n/4096,
    so 4096-65536 expected survivors) can be ranked — the k smallest all
    carry p leading zeros unless fewer than k of ~4096+ expected
    survivors exist (astronomically improbable, and IRRELEVANT to engine
    agreement: both engines apply the identical deterministic rule, the
    adaptive-cap precedent). p is computed with the exact bit-length
    integer log (degree_distribution precedent, no libm), replayed by the
    oracle from count(*). ``prune_at`` (production default 4096) is the
    survivor budget; the driver gate pins prune_at=1 so the pruning
    branch FIRES at fixture vocabulary size (the LSH bucket-cap
    precedent — a group whose every hash is pruned simply emits fewer
    than k registers, identically in both engines)."""
    h = F.md5(F.col(value_col).cast("string"))
    dt = values.select(*group_cols, F.col(value_col)).distinct().select(
        *group_cols, h.alias("h")
    )
    from unsupervised_ner_spark.caching import scoped_persist
    from pyspark.sql import Window

    dt = scoped_persist(dt)
    cnt = dt.groupBy(*group_cols).agg(F.count("*").cast("long").alias("n_vals"))
    # exact integer: p = floor(log16(n/4096)) = (bit_length(n div 4096)-1) div 4
    cnt = cnt.withColumn(
        "p",
        F.expr(
            f"CAST(CASE WHEN n_vals < {prune_at} THEN 0 ELSE"
            f" (length(conv(n_vals div {prune_at}, 10, 2)) - 1) div 4"
            " END AS BIGINT)"
        ),
    )
    pruned = dt.join(cnt, group_cols).filter(
        F.expr("substring(h, 1, CAST(p AS INT)) = repeat('0', CAST(p AS INT))")
    )
    w = Window.partitionBy(*group_cols).orderBy(F.asc("h"))
    return (
        pruned.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select(*group_cols, "rk", "h", "n_vals", "p")
    )


def source_jaccard(documents: DataFrame, k: int = 64) -> DataFrame:
    """Cross-source vocabulary overlap dashboard — KMV Jaccard ESTIMATE
    beside the exact truth, per source pair (Beyer et al. SIGMOD'07
    k-minimum-values; the theta-sketch set-operation workhorse): each
    source keeps its k hash-smallest distinct tokens; a pair's estimate
    is |matches in the k-smallest of the merged sketch| / |merged
    sketch| (a hash inside the union's k-smallest that belongs to both
    vocabularies provably sits in BOTH per-source sketches, so the
    membership flags need no corpus lookback). The exact side replays
    the true intersection/union from the distinct (source, token) table
    — at 100 TB one drops the exact branch and keeps the sketches,
    which is the point: this operator IS the error audit that justifies
    doing so.

    Scale shape: one distinct collapse of the token stream (two-level,
    no Expand), k-smallest per source via a per-source window (bounded
    by vocab), and everything pairwise runs on sketch rows (sources^2 *
    k) plus one vocab-bounded equi-join on token for the exact truth.
    All ppm floors replayed identically by the oracle."""
    from unsupervised_ner_spark.caching import scoped_persist
    from unsupervised_ner_spark.ops.kgtrain import md5_int32
    from pyspark.sql import Window

    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != F.lit("")
    )
    vt = scoped_persist(
        documents.select("source", F.explode(toks).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("_n"))
        .select("source", "tok", md5_int32(F.col("tok")).alias("h"))
    )
    wsk = Window.partitionBy("source").orderBy("h", "tok")
    sk = scoped_persist(
        vt.withColumn("rk", F.row_number().over(wsk))
        .filter(F.col("rk") <= k)
        .select("source", "h")
    )
    srcs = vt.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("source_a"))
        .crossJoin(srcs.select(F.col("source").alias("source_b")))
        .filter(F.col("source_a") < F.col("source_b"))
    )
    ua = pairs.join(
        sk.select(F.col("source").alias("source_a"), "h"), "source_a"
    ).select("source_a", "source_b", "h",
             F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    ub = pairs.join(
        sk.select(F.col("source").alias("source_b"), "h"), "source_b"
    ).select("source_a", "source_b", "h",
             F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    merged = (
        ua.unionByName(ub)
        .groupBy("source_a", "source_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wm = Window.partitionBy("source_a", "source_b").orderBy("h")
    est = (
        merged.withColumn("rk", F.row_number().over(wm))
        .filter(F.col("rk") <= k)
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").cast("long").alias("kmv_k"),
            F.sum(F.col("in_a") * F.col("in_b")).cast("long")
            .alias("kmv_matches"),
        )
    )
    nv = vt.groupBy("source").agg(F.count("*").cast("long").alias("n_voc"))
    inter = (
        vt.select(F.col("source").alias("source_a"), "tok")
        .join(vt.select(F.col("source").alias("source_b"), "tok"), "tok")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("n_intersect"))
    )
    na = nv.select(F.col("source").alias("source_a"),
                   F.col("n_voc").alias("n_a"))
    nb = nv.select(F.col("source").alias("source_b"),
                   F.col("n_voc").alias("n_b"))
    return (
        est.join(inter, ["source_a", "source_b"], "left")
        .withColumn(
            "n_intersect",
            F.coalesce(F.col("n_intersect"), F.lit(0)).cast("long"),
        )
        .join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a", "source_b", "n_a", "n_b", "n_intersect",
            F.expr(
                "n_intersect * 1000000 div (n_a + n_b - n_intersect)"
            ).cast("long").alias("exact_jaccard_ppm"),
            "kmv_k", "kmv_matches",
            F.expr("kmv_matches * 1000000 div kmv_k").cast("long")
            .alias("est_jaccard_ppm"),
        )
        .select(
            "*",
            F.expr("abs(est_jaccard_ppm - exact_jaccard_ppm)")
            .cast("long").alias("err_ppm"),
        )
    )
