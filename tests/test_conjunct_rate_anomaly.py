"""Coordination expansion (triples.conjunct_facts) and trailing-window
rate anomaly (asof.rate_anomaly) tests."""

import datetime

from unsupervised_ner_spark.ops.asof import rate_anomaly
from unsupervised_ner_spark.pipeline.triples import conjunct_facts


def _sents(spark, rows):
    return spark.createDataFrame(
        [(f"u{i}", 0, s) for i, s in enumerate(rows)],
        "url string, sent_idx long, sent string",
    )


def test_conjunct_facts_distributes_over_list(spark):
    out = conjunct_facts(
        _sents(
            spark,
            [
                "alpha, beta and gamma borders delta .",
                "x and y adjoins z",
                "no pattern here at all",
                "single borders thing .",  # no conjunction -> no match
            ],
        )
    ).collect()
    by_url = {}
    for r in out:
        by_url.setdefault(r.url, []).append(r)
    three = sorted(by_url["u0"], key=lambda r: r.conj_idx)
    assert [(r.subj, r.pred, r.obj) for r in three] == [
        ("alpha", "borders", "delta"),
        ("beta", "borders", "delta"),
        ("gamma", "borders", "delta"),
    ]
    assert all(r.n_conjuncts == 3 for r in three)
    assert [r.conj_idx for r in three] == [0, 1, 2]
    two = sorted(by_url["u1"], key=lambda r: r.conj_idx)
    assert [(r.subj, r.pred, r.obj) for r in two] == [
        ("x", "adjoins", "z"), ("y", "adjoins", "z"),
    ]
    assert "u2" not in by_url and "u3" not in by_url


def _ev(spark, rows):
    base = datetime.datetime(1970, 1, 1)
    return spark.createDataFrame(
        [
            (i, base + datetime.timedelta(days=d, hours=1), 1, t)
            for i, (d, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_rate_anomaly_flags_spike_and_coldstart(spark):
    # type A: 2/day on days 1..7, then a 5-event spike on day 8:
    # prior_sum=14 over 7 days -> 5*7*4 = 140 > 5*14 = 70 -> anomaly.
    rows = [(d, "A") for d in range(1, 8) for _ in range(2)]
    rows += [(8, "A")] * 5
    out = {(r.event_type, r.day): r for r in rate_anomaly(_ev(spark, rows)).collect()}
    spike = out[("A", 8)]
    assert (spike.n_events, spike.prior_sum, spike.n_prior_days) == (5, 14, 7)
    assert spike.is_anomaly == 1 and spike.is_coldstart == 0
    # days 1-3 are cold starts (fewer than 3 trailing observed days)
    assert out[("A", 1)].is_coldstart == 1
    assert out[("A", 3)].is_coldstart == 1
    assert out[("A", 4)].is_coldstart == 0
    # a steady day is calm
    assert out[("A", 7)].is_anomaly == 0


def test_rate_anomaly_range_frame_respects_calendar_gaps(spark):
    # 3/day on days 1,2,3 then silence until day 30: the trailing RANGE
    # frame of day 30 is EMPTY (days 23..29 have no rows) -> cold start,
    # not an anomaly judged against months-old data.
    rows = [(d, "B") for d in (1, 2, 3) for _ in range(3)] + [(30, "B")]
    out = {r.day: r for r in rate_anomaly(_ev(spark, rows)).collect()}
    assert out[30].n_prior_days == 0
    assert out[30].is_coldstart == 1 and out[30].is_anomaly == 0
