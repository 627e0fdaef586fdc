"""Incremental connected components (certificate compression == full
recompute), scene segmentation windows, and zone-map pruning flags."""

from pyspark.sql import functions as F

from unsupervised_ner_spark.ops import layout, multimodal
from unsupervised_ner_spark.pipeline import er


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "node_id string")


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "node_a string, node_b string")


def test_components_incremental_matches_full(spark):
    ids = [f"n{i}" for i in range(8)]
    old = [("n0", "n1"), ("n1", "n2"), ("n3", "n4"), ("n5", "n6")]
    # delta merges two old components and attaches an isolated node
    delta = [("n2", "n3"), ("n6", "n7")]
    full_labels, _ = er.connected_components_star(
        _nodes(spark, ids), _edges(spark, old + delta)
    )
    old_labels, _ = er.connected_components_star(_nodes(spark, ids), _edges(spark, old))
    inc_labels, _ = er.components_incremental(
        _nodes(spark, ids), old_labels, _edges(spark, delta)
    )
    full = {r.node_id: r.component for r in full_labels.collect()}
    inc = {r.node_id: r.component for r in inc_labels.collect()}
    assert inc == full
    assert inc["n4"] == "n0"  # the merge propagated through the certificate
    assert inc["n7"] == "n5"


def test_components_incremental_empty_delta_is_identity(spark):
    ids = ["a", "b", "c"]
    old_labels, _ = er.connected_components_star(
        _nodes(spark, ids), _edges(spark, [("a", "b")])
    )
    inc_labels, _ = er.components_incremental(
        _nodes(spark, ids), old_labels, _edges(spark, [])
    )
    assert {r.node_id: r.component for r in inc_labels.collect()} == {
        r.node_id: r.component for r in old_labels.collect()
    }


def test_scene_segments_boundaries(spark):
    # hand-built signatures via md5 prefixes are opaque; instead verify
    # the window mechanics on a crafted frame table whose md5 prefixes we
    # measure first, pinning: per-doc numbering starts at 0, scenes are
    # contiguous, frame conservation holds
    docs = spark.createDataFrame(
        [(1, "x" * 2000), (2, "short")], "doc_id long, text string"
    )
    frames = multimodal.frame_sample(multimodal.synth_media(docs))
    out = multimodal.scene_segments(frames, hamming_threshold=10).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    n_frames_in = {r[0]: r[1] for r in
                   frames.groupBy("doc_id").count().collect()}
    for did, scenes in by_doc.items():
        scenes = sorted(scenes, key=lambda r: r.scene_id)
        assert scenes[0].scene_id == 0
        assert [s.scene_id for s in scenes] == list(range(len(scenes)))
        assert sum(s.n_frames for s in scenes) == n_frames_in[did]
        # ranges are ordered and non-overlapping
        for a, b in zip(scenes, scenes[1:]):
            assert a.last_frame < b.first_frame
    # threshold 0 ALWAYS splits: every frame its own scene
    allsplit = multimodal.scene_segments(frames, hamming_threshold=0)
    assert allsplit.count() == sum(n_frames_in.values())
    # threshold 33 (> bits in a 32-bit sig) NEVER splits: one scene per doc
    nosplit = multimodal.scene_segments(frames, hamming_threshold=33)
    assert nosplit.count() == len(n_frames_in)


def test_zone_map_overlap_rule(spark):
    z = spark.createDataFrame(
        [
            (0, 0, 0), (0, 5, 5),        # cell 0: dims in [0,5]
            (1, 100, 200), (1, 150, 250),  # cell 1: overlaps the box
            (2, 400, 900),               # cell 2: t overlaps? 400 > 300 -> no
        ],
        "zcell long, dim_t long, dim_h long",
    )
    out = {r.zcell: r for r in layout.zone_map(z, 100, 300, 200, 600).collect()}
    assert not out[0].overlaps and out[1].overlaps and not out[2].overlaps
    assert out[1].n_rows == 2 and out[1].min_t == 100 and out[1].max_h == 250
