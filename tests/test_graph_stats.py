"""Graph health dashboard (er.graph_stats) exact-value tests."""

from unsupervised_ner_spark.pipeline.er import graph_stats


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, "ent_a string, type_a string, ent_b string, type_b string"
    )


def test_graph_stats_star_graph(spark):
    # star K1,3: hub degree 3, leaves degree 1 -> n=4, m=3, sum_deg=6.
    # sorted degrees [1,1,1,3], rank_dot = 1+2+3+12 = 18,
    # gini = (36 - 5*6)/(4*6) = 6/24 = 0.25 -> 250000 ppm.
    # density = 6/(4*3) = 0.5 -> 500000 ppm.
    rows = [("h", "T", c, "T") for c in ("a", "b", "c")]
    r = graph_stats(_edges(spark, rows)).collect()[0]
    assert (r.n_nodes, r.n_edges, r.sum_deg, r.max_deg) == (4, 3, 6, 3)
    assert r.density_ppm == 500000
    assert r.gini_ppm == 250000


def test_graph_stats_regular_graph_zero_gini(spark):
    # triangle: all degrees equal -> gini 0, density 1.
    rows = [("a", "T", "b", "T"), ("b", "T", "c", "T"), ("a", "T", "c", "T")]
    r = graph_stats(_edges(spark, rows)).collect()[0]
    assert (r.n_nodes, r.n_edges, r.gini_ppm, r.density_ppm) == (
        3, 3, 0, 1000000,
    )


def test_graph_stats_single_edge_guard(spark):
    # two nodes, one edge: density over n*(n-1)=2 -> 1000000; gini 0.
    r = graph_stats(_edges(spark, [("a", "T", "b", "T")])).collect()[0]
    assert (r.n_nodes, r.n_edges, r.density_ppm, r.gini_ppm) == (
        2, 1, 1000000, 0,
    )
