"""Unit tests for entity_trends (daily series + integer burst rule) and
cluster_stats (ER cluster-size histogram)."""

from unsupervised_ner_spark.pipeline import er

DAY = 86400


def _typed(spark, rows):
    return spark.createDataFrame(
        rows, "url string, surface string, pred_group string, obs_ts long"
    )


def test_entity_trends_counts_and_burst(spark):
    rows = (
        # 'Covid' day 0: 5 mentions; day 1: 1; day 2: 1 -> day 0 bursts
        [("u%d" % i, "Covid", "DISEASE", 0) for i in range(5)]
        + [("a", "Covid", "DISEASE", DAY), ("b", "Covid", "DISEASE", 2 * DAY)]
        # flat entity: 1 mention/day over 2 days -> no burst
        + [("c", "Aspirin", "DRUG", 0), ("d", "Aspirin", "DRUG", DAY)]
        # OTHER filtered out entirely
        + [("e", "junk", "OTHER", 0)]
    )
    out = {
        (r.ent, r.obs_day): r
        for r in er.entity_trends(_typed(spark, rows)).collect()
    }
    assert set(out) == {
        ("covid", 0), ("covid", 1), ("covid", 2), ("aspirin", 0), ("aspirin", 1)
    }
    c0 = out[("covid", 0)]
    assert (c0.n_mentions, c0.n_total, c0.n_days) == (5, 7, 3)
    # 5 * 3 * 2 = 30 > 3 * 7 = 21 -> burst
    assert c0.is_burst == 1
    assert out[("covid", 1)].is_burst == 0
    assert out[("aspirin", 0)].is_burst == 0  # 1*2*2 = 4 > 3*2 = 6 is false


def test_entity_trends_normalizes_surfaces(spark):
    rows = [
        ("u1", "New York", "LOCATION", 0),
        ("u2", "new   york!", "LOCATION", 0),
    ]
    [r] = er.entity_trends(_typed(spark, rows)).collect()
    assert r.ent == "new york" and r.n_mentions == 2


def test_cluster_stats_histogram(spark):
    memb = spark.createDataFrame(
        [
            ("a", "T", "e1"), ("b", "T", "e1"), ("c", "T", "e1"),  # size 3
            ("d", "T", "e2"), ("e", "T", "e3"),                     # 2x size 1
            ("f", "U", "e4"), ("g", "U", "e4"),                     # size 2
        ],
        "norm_surface string, etype string, entity_id string",
    )
    out = {
        (r.etype, r.cluster_size): (r.n_clusters, r.n_surfaces)
        for r in er.cluster_stats(memb).collect()
    }
    assert out == {
        ("T", 3): (1, 3),
        ("T", 1): (2, 2),
        ("U", 2): (1, 2),
    }
