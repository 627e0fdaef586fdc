"""Kahn layering (er.topo_layers), Good-Turing fof (textstats.
good_turing_fof), and bloom semi-join accounting (layout.
bloom_semijoin_stats) vs exact Python replications."""

import hashlib

from unsupervised_ner_spark.ops.layout import bloom_semijoin_stats
from unsupervised_ner_spark.ops.textstats import good_turing_fof
from unsupervised_ner_spark.pipeline.er import topo_layers


def _dag(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1) for a, b in pairs],
        "scc_a string, scc_b string, n_edges long",
    )


def test_topo_layers_longest_path(spark):
    # diamond a->(b,c)->d plus a chain d->e: layer = longest path depth
    pairs = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e"),
             ("a", "d")]  # shortcut edge must NOT shorten d's layer
    got = {
        r.scc: (r.status, r.layer)
        for r in topo_layers(_dag(spark, pairs), rounds=5).collect()
    }
    assert got == {
        "a": ("layered", 0), "b": ("layered", 1), "c": ("layered", 1),
        "d": ("layered", 2), "e": ("layered", 3),
    }


def test_topo_layers_cycle_stays_open(spark):
    # source -> 2-cycle -> sink: the cycle (and everything downstream of
    # it) can never peel; the source still layers
    pairs = [("s", "x"), ("x", "y"), ("y", "x"), ("y", "t")]
    got = {
        r.scc: (r.status, r.layer)
        for r in topo_layers(_dag(spark, pairs), rounds=4).collect()
    }
    assert got["s"] == ("layered", 0)
    assert got["x"] == ("open", -1)
    assert got["y"] == ("open", -1)
    assert got["t"] == ("open", -1)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_good_turing_exact(spark):
    # freqs: a->3, b->2, c->2, d->1, e->1  =>  N_1=2, N_2=2, N_3=1
    texts = ["a a b C d", "A b c e"]
    got = {
        r.freq: (r.n_types, r.n_tokens, r.gt_num)
        for r in good_turing_fof(_docs(spark, texts)).collect()
    }
    assert got == {
        1: (2, 2, 2 * 2),   # gt_num = (r+1) * N_2
        2: (2, 4, 3 * 1),   # gt_num = (r+1) * N_3
        3: (1, 3, 0),       # N_4 absent -> 0
    }


def _keys(spark, ks):
    return spark.createDataFrame([(k,) for k in ks], "key long")


def _pos(key, i, m=1024):
    return int(
        hashlib.md5(f"{key}#{i}".encode()).hexdigest()[:8], 16
    ) % m


def test_bloom_semijoin_matches_python(spark):
    build = [1, 2, 3, 4]
    probe = list(range(1, 200))
    bits = {_pos(k, i) for k in build for i in range(2)}
    exp: dict[tuple, int] = {}
    for k in probe:
        bp = 1 if all(_pos(k, i) in bits for i in range(2)) else 0
        im = 1 if k in build else 0
        exp[(bp, im)] = exp.get((bp, im), 0) + 1
    got = {
        (r.bloom_pass, r.is_match): (r.n_rows, r.n_bits_set)
        for r in bloom_semijoin_stats(
            _keys(spark, probe), _keys(spark, build), m=1024, k=2
        ).collect()
    }
    assert {k: v[0] for k, v in got.items()} == exp
    assert all(v[1] == len(bits) for v in got.values())
    # structural no-false-negative: a match always passes the bloom
    assert (0, 1) not in got
    # total accounting: every probe row lands in exactly one cell
    assert sum(v[0] for v in got.values()) == len(probe)


def test_bloom_tiny_filter_saturates(spark):
    # m=2: with 4 build keys both bits are almost surely set -> every
    # probe row passes (FP for all non-members), never a false negative
    build = [10, 20, 30, 40]
    probe = [10, 99, 77]
    rows = bloom_semijoin_stats(
        _keys(spark, probe), _keys(spark, build), m=2, k=2
    ).collect()
    got = {(r.bloom_pass, r.is_match): r.n_rows for r in rows}
    assert (0, 1) not in got
    bits = {_pos(k, i, 2) for k in build for i in range(2)}
    if len(bits) == 2:
        assert got == {(1, 1): 1, (1, 0): 2}
