"""Lakehouse maintenance operators (ops/layout.py): Morton-key bit math,
compaction-plan packing invariants, MERGE semantics, and skew-report
exactness — plus the brute-force cross-checks that pin each rule."""

import pytest
from pyspark.sql import functions as F

from unsupervised_ner_spark.ops import layout


def _morton_py(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def test_morton_key_matches_bruteforce(spark):
    rows = [(a, b) for a in (0, 1, 2, 3, 255, 1023) for b in (0, 1, 5, 512, 1023)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", layout.morton_key(F.col("a"), F.col("b"), 10).alias("z")
        ).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _morton_py(a, b, 10), (a, b)


def test_morton_locality_prefix_property(spark):
    """Equal high bits of both dims => equal high bits of the key (the
    pruning property a Z-order rewrite relies on)."""
    a, b = 0b1100110011, 0b1010101010
    for da in range(4):
        for db in range(4):
            z1 = _morton_py(a, b, 10)
            z2 = _morton_py((a & ~3) | da, (b & ~3) | db, 10)
            # low 2 bits of each dim interleave into the low 4 key bits
            assert z1 >> 4 == z2 >> 4


def test_compaction_plan_invariants(spark):
    files = spark.createDataFrame(
        [("p1", i, 300) for i in range(10)] + [("p2", i, 1000) for i in range(3)],
        "part string, file_id long, bytes long",
    )
    out = layout.compaction_plan(files, target_bytes=1000).collect()
    by_part = {}
    for r in out:
        by_part.setdefault(r.part, []).append(r)
    # p1: 10 x 300 bytes -> groups of ceil-ish packing: run starts
    # 0,300,...,2700 -> group = run div 1000 -> sizes 4,3,3
    p1 = sorted(by_part["p1"], key=lambda r: r.group_id)
    assert [r.n_files for r in p1] == [4, 3, 3]
    assert [r.total_bytes for r in p1] == [1200, 900, 900]
    # id ranges are contiguous and ordered
    assert p1[0].min_file_id == 0 and p1[0].max_file_id == 3
    assert p1[1].min_file_id == 4 and p1[2].max_file_id == 9
    # every group but a partition's last reaches the target
    for grp in p1[:-1]:
        assert grp.total_bytes >= 1000 - 300  # within one file of target
    # p2: each 1000-byte file starts a new group
    assert [r.n_files for r in sorted(by_part["p2"], key=lambda r: r.group_id)] == [1, 1, 1]
    # conservation: bytes and file counts sum to the input
    assert sum(r.total_bytes for r in out) == 10 * 300 + 3 * 1000
    assert sum(r.n_files for r in out) == 13


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [(2, "B", "U"), (3, "c", "D"), (9, "Z", "U")],
        "k long, v string, op string",
    )
    out = {r.k: (r.v, r.action) for r in layout.merge_upsert(target, changes, "k").collect()}
    assert out == {1: ("a", "kept"), 2: ("B", "updated"), 9: ("Z", "inserted")}
    # empty change batch: everything kept
    empty = spark.createDataFrame([], "k long, v string, op string")
    kept = layout.merge_upsert(target, empty, "k").collect()
    assert {r.action for r in kept} == {"kept"} and len(kept) == 3


def test_skew_report_exact_shares_and_ties(spark):
    rows = [("hot",)] * 60 + [("warm",)] * 30 + [("a",)] * 5 + [("b",)] * 5
    df = spark.createDataFrame(rows, "key string")
    out = {r.key: r for r in layout.skew_report(df, "key", top_k=3, hot_ppm=500_000).collect()}
    assert len(out) == 3 and "b" not in out  # tie broken: 'a' < 'b'
    assert out["hot"].share_ppm == 600_000 and out["hot"].hot
    assert out["warm"].share_ppm == 300_000 and not out["warm"].hot
    assert out["a"].rnk == 3 and out["a"].n == 5 and out["a"].total == 100


def test_zorder_keys_cell_groups(spark):
    df = spark.createDataFrame(
        [(i, i % 32, (i * 7) % 32) for i in range(64)], "id long, dim_t long, dim_h long"
    )
    out = layout.zorder_keys(df, "dim_t", "dim_h", bits=5, cell_shift=4).collect()
    for r in out:
        assert r.zkey == _morton_py(r.dim_t, r.dim_h, 5)
        assert r.zcell == r.zkey >> 4
