"""Unit tests for the distributed Lloyd update (ops/simsearch.py
kmeans_update) and predicate domain/range signature induction
(pipeline/triples.py predicate_signatures); the corpus-scale parity gates
are ann_kmeans_update / kg_pred_signatures."""

from __future__ import annotations

import hashlib
import math

from unsupervised_ner_spark.ops import simsearch
from unsupervised_ner_spark.pipeline.triples import predicate_signatures


def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _py_kmeans_update(vecs, n_centroids, scale=1000):
    """Pure-Python replication of the operator's exact arithmetic."""
    ids = sorted(range(len(vecs)), key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    cents = sorted(ids[:n_centroids])
    out = {}
    for i, v in enumerate(vecs):
        # float32 cast first (the operator reads array<float>)
        import struct
        v = [struct.unpack("f", struct.pack("f", x))[0] for x in v]
        best = None
        for c in cents:
            cv = [struct.unpack("f", struct.pack("f", x))[0] for x in vecs[c]]
            d2 = round(
                sum(x * x for x in v) - 2 * sum(x * y for x, y in zip(v, cv))
                + sum(y * y for y in cv), 9)
            if best is None or (d2, c) < best[:2]:
                best = (d2, c)
        c = best[1]
        for pos, x in enumerate(v):
            k = (c, pos)
            n, s = out.get(k, (0, 0))
            out[k] = (n + 1, s + math.floor(x * scale))
    return out


def test_kmeans_update_matches_python(spark):
    vecs = [
        [0.1, 0.2], [0.11, 0.19], [5.0, 5.1], [5.2, 4.9],
        [-0.0005, 2.5], [0.09, 0.21],
    ]
    got = {
        (r.centroid_id, r.pos): (r.n_members, r.sum_q)
        for r in simsearch.kmeans_update(_emb(spark, vecs), n_centroids=2).collect()
    }
    assert got == _py_kmeans_update(vecs, 2)
    # every vector lands in exactly one cell
    assert sum(n for (c, p), (n, s) in got.items() if p == 0) == len(vecs)


def test_kmeans_update_negative_floor(spark):
    # floor(-0.0005 * 1000) = floor(-0.5) = -1, NOT truncation toward 0 —
    # the quantization both engines must share exactly.
    vecs = [[-0.0005], [1.0]]
    got = {
        (r.centroid_id, r.pos): r.sum_q
        for r in simsearch.kmeans_update(_emb(spark, vecs), n_centroids=2).collect()
    }
    assert sorted(got.values()) == [-1, 1000]


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "pred_norm string, subj_type string, obj_type string"
    )


def test_predicate_signatures_flags(spark):
    t = _triples(spark, [
        # p1: modal (A,B)=3 of 5 -> majority-dominant
        *[("p1", "A", "B")] * 3, *[("p1", "A", "C")] * 2,
        # p2: three singleton signatures -> modal by tie-break, NOT dominant
        ("p2", "A", "B"), ("p2", "A", "C"), ("p2", "B", "C"),
        # p3: single signature -> trivially dominant
        ("p3", "X", "Y"),
    ])
    out = {
        (r.pred_norm, r.subj_type, r.obj_type): r
        for r in predicate_signatures(t).collect()
    }
    p1 = out[("p1", "A", "B")]
    assert (p1.sig_rank, p1.is_modal, p1.is_dominant, p1.n_total) == (1, 1, 1, 5)
    assert out[("p1", "A", "C")].is_modal == 0
    p2 = out[("p2", "A", "B")]  # ties break (n desc, subj asc, obj asc)
    assert (p2.sig_rank, p2.is_modal, p2.is_dominant) == (1, 1, 0)
    assert out[("p3", "X", "Y")].is_dominant == 1
    assert len(out) == 6
