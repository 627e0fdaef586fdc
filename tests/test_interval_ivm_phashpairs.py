"""Bucket-binned interval join boundary semantics, incremental closure ==
full closure, and pHash pair blocking vs hand-built signatures."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from unsupervised_ner_spark.ops.asof import interval_join
from unsupervised_ner_spark.pipeline.taxonomy import (
    taxonomy_closure,
    taxonomy_closure_incremental,
)


def _ts(sec):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


def test_interval_join_boundaries(spark):
    # bucket = 100s; interval A [100, 300) spans 3 cells; B [250, 350)
    ivs = spark.createDataFrame(
        [("A", _ts(100), _ts(300)), ("B", _ts(250), _ts(350))],
        "iv_id string, s timestamp, e timestamp",
    )
    pts = spark.createDataFrame(
        [(1, _ts(100)),   # == start of A: included
         (2, _ts(300)),   # == end of A: excluded; inside B
         (3, _ts(299)),   # in A and B (overlap region)
         (4, _ts(350)),   # == end of B: excluded everywhere
         (5, _ts(50))],   # before everything
        "pid long, ts timestamp",
    )
    got = {
        (r.pid, r.iv_iv_id): r.us_into_interval
        for r in interval_join(
            pts, ivs, point_ts="ts", start_ts="s", end_ts="e",
            bucket_us=100_000_000,
            point_cols=["pid"], interval_cols=["iv_id"],
        ).collect()
    }
    assert got == {
        (1, "A"): 0,
        (2, "B"): 50_000_000,
        (3, "A"): 199_000_000,
        (3, "B"): 49_000_000,
    }


def test_incremental_closure_equals_full(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    node = st.integers(min_value=0, max_value=6).map(lambda i: f"v{i}")

    def edf(pairs):
        pairs = list(pairs) or [("x", "x")]
        df = spark.createDataFrame(
            [(a, b, 1, 1, "isa") for a, b in pairs],
            "hypo string, hyper string, n_sents long, n_docs long, pattern string",
        )
        return df if pairs != [("x", "x")] else df.filter(F.lit(False))

    def closure_set(df):
        return {(r.hypo, r.hyper, r.hops) for r in df.collect()}

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(st.tuples(node, node), min_size=0, max_size=10),
        st.lists(st.tuples(node, node), min_size=0, max_size=10),
    )
    def run(old_pairs, delta_pairs):
        old_pairs = [(a, b) for a, b in old_pairs if a != b]
        delta_pairs = [(a, b) for a, b in delta_pairs if a != b]
        inc = taxonomy_closure_incremental(
            taxonomy_closure(edf(old_pairs), max_hops=8),
            edf(delta_pairs), max_hops=8,
        )
        full = taxonomy_closure(edf(old_pairs + delta_pairs), max_hops=8)
        assert closure_set(inc) == closure_set(full)

    run()


def test_phash_pairs_blocking_and_verify(spark):
    from unsupervised_ner_spark.ops.multimodal import phash_pairs

    z = "0" * 64
    flip = lambda s, idxs: "".join(
        ("1" if c == "0" else "0") if i in idxs else c for i, c in enumerate(s)
    )
    sigs = spark.createDataFrame(
        [
            (1, z),                              # base
            (2, flip(z, {0})),                   # ham 1 vs base
            (3, flip(z, set(range(7)))),         # ham 7 vs base (block 0 differs,
                                                 # blocks 1-7 equal -> candidate)
            (4, flip(z, {0, 8, 16, 24, 32, 40, 48, 56})),  # ham 8 vs base:
                                                 # every block differs by 1 bit ->
                                                 # NO shared block with base
            (5, "1" * 64),                       # far from everything
        ],
        "doc_id long, phash_bits string",
    )
    got = {(r.doc_a, r.doc_b): r.hamming for r in phash_pairs(sigs).collect()}
    assert got[(1, 2)] == 1
    assert got[(1, 3)] == 7
    assert (1, 4) not in got          # pigeonhole: ham 8 spread over all blocks
    assert (1, 5) not in got and (2, 5) not in got
    # 2 vs 3: bits 0 equal ('1'), bits 1-6 differ -> ham 6, shares blocks 1-7
    assert got[(2, 3)] == 6
