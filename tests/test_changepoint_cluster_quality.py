"""CUSUM changepoint (asof.cusum_changepoint) and cluster diagnostics
(simsearch.cluster_quality) branch tests."""

import datetime
import hashlib
import math

from unsupervised_ner_spark.ops.asof import cusum_changepoint
from unsupervised_ner_spark.ops.simsearch import cluster_quality


def test_cusum_spike_day_is_peak(spark):
    # type A: 1 event/day on days 0-3, then 5 events on day 4.
    # daily=[1,1,1,1,5], total=9, n_days=5, dev_i = cum*5 - i*9 =
    # [-4,-8,-12,-16,0] -> peak |dev| at the day BEFORE the spike.
    base = datetime.datetime(1970, 1, 1, 12, 0, 0)
    rows = []
    for d in range(4):
        rows.append(("A", base + datetime.timedelta(days=d)))
    for _ in range(5):
        rows.append(("A", base + datetime.timedelta(days=4)))
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    r = cusum_changepoint(ev).collect()[0]
    assert (r.n_days, r.total) == (5, 9)
    assert (r.peak_day, r.peak_dev) == (3, -16)


def test_cusum_uniform_rate_small_dev(spark):
    # perfectly uniform: dev is 0 at every day.
    base = datetime.datetime(1970, 1, 1)
    rows = [("B", base + datetime.timedelta(days=d)) for d in range(6)]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    r = cusum_changepoint(ev).collect()[0]
    assert r.peak_dev == 0 and r.peak_day == 0  # tie -> earliest day


def test_cluster_quality_exact_replication(spark):
    vecs = {0: [0.0, 0.0], 1: [10.0, 10.0], 2: [0.0, 1.0], 3: [10.0, 9.0]}
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    out = {r.centroid_id: r for r in cluster_quality(emb, n_centroids=2).collect()}

    # replicate: codebook = 2 smallest md5(str(vec_id))
    cents = sorted(vecs, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())[:2]
    assert set(out) == set(cents)

    def d2(a, b):
        return round(
            sum(x * x for x in a) - 2 * sum(x * y for x, y in zip(a, b))
            + sum(y * y for y in b), 9,
        )

    assign = {}
    for i, v in vecs.items():
        assign[i] = min(cents, key=lambda c: (d2(v, vecs[c]), c))
    for c in cents:
        members = [i for i, a in assign.items() if a == c]
        r = out[c]
        assert r.n_members == len(members)
        assert r.inertia_q == sum(
            math.floor(d2(vecs[i], vecs[c]) * 1_000_000) for i in members
        )
        other = [x for x in cents if x != c][0]
        assert r.nn_centroid_id == other
        assert r.nn_d2_q == math.floor(d2(vecs[c], vecs[other]) * 1_000_000)
