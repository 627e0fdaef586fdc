"""HyperLogLog register sketches (ops/sketches.py) and TF-IDF top-k
(ops/textstats.py tfidf_topk)."""

import hashlib
import math

from pyspark.sql import functions as F

from unsupervised_ner_spark.ops import sketches, textstats


def _py_rho(value: str) -> int:
    """Reference rho: leading zero bits of the 48-bit md5 suffix + 1."""
    h = hashlib.md5(value.encode()).hexdigest()
    bits = bin(int(h[2:14], 16))[2:].zfill(48)
    lz = len(bits) - len(bits.lstrip("0"))
    return lz + 1


def test_rho_matches_python_reference(spark):
    vals = [f"token{i}" for i in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {
        r.v: (r.bucket, r.r_max)
        for r in sketches.hll_registers(df, ["v"], "v").collect()
    }
    for v in vals:
        h = hashlib.md5(v.encode()).hexdigest()
        assert got[v] == (h[:2], _py_rho(v)), v


def test_hll_estimate_within_error_bound(spark):
    n = 5000
    df = spark.createDataFrame(
        [(f"g", f"val-{i % n}") for i in range(2 * n)], "g string, v string"
    )
    regs = sketches.hll_registers(df, ["g"], "v")
    # duplicates must not change the registers (max over occurrences)
    regs_distinct = sketches.hll_registers(df.distinct(), ["g"], "v")
    assert {tuple(r) for r in regs.collect()} == {
        tuple(r) for r in regs_distinct.collect()
    }
    est = sketches.hll_estimate(regs, ["g"]).collect()[0].estimate
    assert abs(est - n) / n < sketches.hll_error_bound(3.0)


def test_hll_merge_equals_whole(spark):
    rows = [("g", f"v{i}") for i in range(3000)]
    df = spark.createDataFrame(rows, "g string, v string")
    a = df.filter(F.crc32(F.col("v")) % 2 == 0)
    b = df.filter(F.crc32(F.col("v")) % 2 == 1)
    merged = sketches.merge_registers(
        sketches.hll_registers(a, ["g"], "v"),
        sketches.hll_registers(b, ["g"], "v"),
        ["g"],
    )
    whole = sketches.hll_registers(df, ["g"], "v")
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in whole.collect()}


def test_tfidf_topk_ranking_and_ties(spark):
    docs = [
        ("d1", "apple apple apple banana the the"),
        ("d2", "banana cherry the the the"),
        ("d3", "the the the the"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    out = textstats.tfidf_topk(df, k=2)
    got = {
        (r.doc_id, r.rank): (r.term, r.tf, r.df) for r in out.collect()
    }
    # 'the' appears in all 3 docs -> idf ln(1) = 0 -> never outranks others
    assert got[("d1", 1)] == ("apple", 3, 1)
    assert got[("d1", 2)] == ("banana", 1, 2)
    assert got[("d2", 1)] == ("cherry", 1, 1)
    assert got[("d2", 2)] == ("banana", 1, 2)
    # d3 has only 'the' (score 0) — still emitted, rank 1
    assert got[("d3", 1)][0] == "the"
    # per-doc cap respected
    assert all(rank <= 2 for (_, rank) in got)


def test_tfidf_score_i9_matches_python(spark):
    docs = [("d1", "x x y"), ("d2", "y z")]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    rows = textstats.tfidf_topk(df, k=5).collect()
    for r in rows:
        expect = round(r.tf * math.log(2.0 / r.df) * 1e9)
        assert r.score_i9 == expect, (r.term, r.score_i9, expect)


def test_cms_estimate_upper_bounds_and_heavy_hitters(spark):
    import random

    rng = random.Random(7)
    vals = (["hot"] * 500 + ["warm"] * 120
            + [f"cold-{rng.randrange(2000)}" for _ in range(1500)])
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    cms = sketches.cms_counters(df, "v")
    # total mass is preserved per row
    per_row = {r.row_idx: r.s for r in
               cms.groupBy("row_idx").agg(F.sum("cnt").alias("s")).collect()}
    assert per_row == {i: len(vals) for i in range(sketches.CMS_DEPTH)}
    queries = spark.createDataFrame(
        [("hot",), ("warm",), ("never-seen",)], "v string"
    )
    est = {r.v: r.est for r in sketches.cms_estimate(cms, queries, "v").collect()}
    truth = {"hot": 500, "warm": 120, "never-seen": 0}
    for k, t in truth.items():
        assert est[k] >= t                      # one-sided error
        assert est[k] <= t + 0.01 * len(vals)   # eps*N overshoot bound (w=4096)


def test_cms_merge_equals_whole(spark):
    rows = [(f"v{i % 40}", i) for i in range(400)]
    df = spark.createDataFrame(rows, "v string, i long")
    a = df.filter("i % 3 = 0")
    b = df.filter("i % 3 != 0")
    merged = sketches.cms_merge(
        sketches.cms_counters(a, "v"), sketches.cms_counters(b, "v")
    )
    whole = sketches.cms_counters(df, "v")
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in whole.collect()}


def test_bloom_no_false_negatives_and_deterministic(spark):
    members = [(f"m{i}",) for i in range(300)]
    others = [(f"x{i}",) for i in range(300)]
    mdf = spark.createDataFrame(members, "v string")
    bits = sketches.bloom_bits(mdf, "v")
    # bit table bounded by k x positions
    assert bits.count() <= sketches.BLOOM_K * 16**sketches.BLOOM_POS_HEX
    probes = spark.createDataFrame(members + others, "v string")
    maybe = {r.v for r in sketches.bloom_maybe_contains(probes, bits, "v").collect()}
    # no false negatives: every member is flagged
    assert {v for (v,) in members} <= maybe
    # determinism: identical on a rebuild
    maybe2 = {
        r.v
        for r in sketches.bloom_maybe_contains(
            probes, sketches.bloom_bits(mdf, "v"), "v"
        ).collect()
    }
    assert maybe == maybe2
    # false positives exist in principle but must be rare at this load
    fps = maybe - {v for (v,) in members}
    assert len(fps) <= 5


def test_bloom_merge_is_union(spark):
    a = spark.createDataFrame([("a1",), ("a2",)], "v string")
    b = spark.createDataFrame([("b1",), ("a1",)], "v string")
    merged = sketches.bloom_bits(a, "v").union(
        sketches.bloom_bits(b, "v")
    ).distinct()
    whole = sketches.bloom_bits(a.union(b), "v")
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in whole.collect()}


def test_kmv_registers_both_branches(spark):
    import hashlib

    from unsupervised_ner_spark.ops.sketches import kmv_registers

    vals = [(g, f"v{i}") for g in ("a", "b") for i in range(40)]
    df = spark.createDataFrame(vals + vals, "g string, v string")  # dups collapse

    def expect(prune_at, k):
        out = {}
        for g in ("a", "b"):
            hs = sorted(
                hashlib.md5(f"v{i}".encode()).hexdigest() for i in range(40)
            )
            n = len(hs)
            if n < prune_at:
                p = 0
            else:
                p = (max((n // prune_at).bit_length() - 1, 0)) // 4
            kept = [h for h in hs if h.startswith("0" * p)]
            out[g] = [(rk + 1, h, n, p) for rk, h in enumerate(kept[:k])]
        return out

    # branch 1: prune_at large -> p = 0, plain top-k
    got0 = kmv_registers(df, ["g"], "v", k=5, prune_at=4096).collect()
    e0 = expect(4096, 5)
    assert {(r.g, r.rk, r.h, r.n_vals, r.p) for r in got0} == {
        (g, rk, h, n, p) for g, rows in e0.items() for rk, h, n, p in rows
    }
    # branch 2: prune_at=1 -> p = (bitlen(40)-1)//4 = 1, only '0...' hashes
    got1 = kmv_registers(df, ["g"], "v", k=64, prune_at=1).collect()
    e1 = expect(1, 64)
    assert {(r.g, r.rk, r.h, r.n_vals, r.p) for r in got1} == {
        (g, rk, h, n, p) for g, rows in e1.items() for rk, h, n, p in rows
    }
    assert all(r.p == 1 and r.h.startswith("0") for r in got1)


def test_kmv_registers_merge_semantics(spark):
    # KMV merge = union + re-top-k: sketching the union directly equals
    # merging the two halves' registers
    from unsupervised_ner_spark.ops.sketches import kmv_registers

    half1 = [("g", f"x{i}") for i in range(30)]
    half2 = [("g", f"y{i}") for i in range(30)]
    a = kmv_registers(
        spark.createDataFrame(half1, "g string, v string"), ["g"], "v", k=8
    ).select("g", "h")
    b = kmv_registers(
        spark.createDataFrame(half2, "g string, v string"), ["g"], "v", k=8
    ).select("g", "h")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    merged = (
        a.unionByName(b)
        .withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("g").orderBy(F.asc("h"))),
        )
        .filter(F.col("rk") <= 8)
        .select("g", "rk", "h")
    )
    direct = kmv_registers(
        spark.createDataFrame(half1 + half2, "g string, v string"),
        ["g"], "v", k=8,
    ).select("g", "rk", "h")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
