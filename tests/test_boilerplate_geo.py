"""Host boilerplate detection (textstats.host_boilerplate) and grid-cell
geo near-pairs (dedup.geo_near_pairs) tests."""

from unsupervised_ner_spark.ops.dedup import geo_near_pairs
from unsupervised_ner_spark.ops.textstats import host_boilerplate


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def test_host_boilerplate_ratio_rule_is_per_host(spark):
    # host A (4 docs): "nav" in all 4 (100% -> flagged), "rare" in 1
    # (25% -> clean). host B (2 docs): "rare" in 1 of 2 (50% -> flagged)
    # — the SAME line is template on B but organic on A.
    rows = [
        (0, "A", "nav\nalpha"), (1, "A", "nav\nbeta"),
        (2, "A", "nav\ngamma"), (3, "A", "nav\nrare"),
        (4, "B", "rare\ndelta"), (5, "B", "epsilon"),
    ]
    out = {
        (r.source, r.norm): r
        for r in host_boilerplate(_docs(spark, rows), 300000).collect()
    }
    assert out[("A", "nav")].is_boilerplate == 1
    assert out[("A", "nav")].ratio_ppm == 1_000_000
    assert out[("A", "rare")].is_boilerplate == 0
    assert out[("A", "rare")].ratio_ppm == 250_000
    assert out[("B", "rare")].is_boilerplate == 1
    assert out[("B", "rare")].ratio_ppm == 500_000


def test_host_boilerplate_counts_docs_not_occurrences(spark):
    # the same line twice in ONE doc counts once (distinct doc level)
    rows = [(0, "A", "dup\ndup"), (1, "A", "x")]
    out = {
        r.norm: r for r in host_boilerplate(_docs(spark, rows)).collect()
    }
    assert out["dup"].n_docs_line == 1
    assert out["dup"].ratio_ppm == 500_000


def _pts(spark, rows):
    return spark.createDataFrame(rows, "pid long, lat long, lon long")


def test_geo_near_pairs_exact_distance_and_radius(spark):
    rows = [
        (0, 0, 0),
        (1, 3000, 4000),       # d2 = 25e6 < 4e8 -> near
        (2, 19999, 0),         # d2 = 19999^2 < 4e8 -> near (same axis)
        (3, 200000, 200000),   # far from everyone
        (4, 214000, 214000),   # d2 vs 3 = 2*14000^2 = 392e6 < 4e8 near,
                               # crosses a cell boundary (200000//20000=10,
                               # 214000//20000=10)... and vs others far
    ]
    out = {(r.pid_a, r.pid_b): r.d2 for r in
           geo_near_pairs(_pts(spark, rows), radius=20000).collect()}
    assert out[(0, 1)] == 3000 ** 2 + 4000 ** 2
    assert out[(0, 2)] == 19999 ** 2
    assert out[(3, 4)] == 2 * 14000 ** 2
    assert (1, 2) in out  # d2 = 16999^2 + 4000^2 < 4e8
    assert all({a, b} != {0, 3} for a, b in out)
    # each unordered pair exactly once, ordered pid_a < pid_b
    assert all(a < b for a, b in out)


def test_geo_near_pairs_cross_cell_boundary_negative_coords(spark):
    # points straddling cell 0 / cell -1 at distance 2 must still pair
    # (floor division on negatives: -1 // 20000 = cell -1)
    out = geo_near_pairs(
        _pts(spark, [(0, -1, -1), (1, 1, 1)]), radius=20000
    ).collect()
    assert len(out) == 1 and out[0].d2 == 8


def test_geo_near_pairs_strictly_within_radius(spark):
    # exactly at radius on one axis is NOT near (strict <)
    out = geo_near_pairs(
        _pts(spark, [(0, 0, 0), (1, 20000, 0)]), radius=20000
    ).collect()
    assert out == []
