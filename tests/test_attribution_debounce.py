"""Conversion attribution (asof.touch_attribution) and burst-collapse
debounce (asof.debounce) tests."""

import datetime

from unsupervised_ner_spark.ops.asof import debounce, touch_attribution


def _ev(spark, rows):
    """rows: (seconds, user, type, value)."""
    base = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, base + datetime.timedelta(seconds=s), u, t, float(v))
            for i, (s, u, t, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )


def test_attribution_models(spark):
    rows = [
        # user 1: view -> click -> purchase 5.00
        (10, 1, "view", 0.0), (20, 1, "click", 0.0),
        (30, 1, "purchase", 5.0),
        # user 2: purchase with no preceding touch -> direct
        (5, 2, "purchase", 1.23),
        # user 3: purchase, then view, then purchase 2.00 each
        (1, 3, "purchase", 2.0), (2, 3, "view", 0.0),
        (3, 3, "purchase", 2.0),
    ]
    out = {
        (r.model, r.channel): r
        for r in touch_attribution(_ev(spark, rows)).collect()
    }
    last_click = out[("last_touch", "click")]
    assert (last_click.n_conversions, last_click.cents) == (1, 500)
    assert last_click.sum_lag_us == 10_000_000
    last_direct = out[("last_touch", "direct")]
    assert (last_direct.n_conversions, last_direct.cents) == (2, 323)
    assert last_direct.sum_lag_us == 0
    last_view = out[("last_touch", "view")]
    assert (last_view.n_conversions, last_view.cents) == (1, 200)
    assert last_view.sum_lag_us == 1_000_000
    first_view = out[("first_touch", "view")]
    assert (first_view.n_conversions, first_view.cents) == (2, 700)
    assert first_view.sum_lag_us == 20_000_000 + 1_000_000
    first_direct = out[("first_touch", "direct")]
    assert (first_direct.n_conversions, first_direct.cents) == (2, 323)
    assert len(out) == 5


def test_attribution_tie_breaks_on_event_id(spark):
    # touch and purchase share a timestamp: event_id orders the frame, and
    # the strictly-preceding frame still sees the same-ts earlier touch
    base = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (0, base, 1, "click", 0.0),
            (1, base, 1, "purchase", 1.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    out = {r.model: r for r in touch_attribution(df).collect()}
    assert out["last_touch"].channel == "click"
    assert out["last_touch"].sum_lag_us == 0


def test_debounce_islands(spark):
    rows = [
        (0, 1, "click", 0.0), (10, 1, "click", 0.0), (20, 1, "click", 0.0),
        (7200, 1, "click", 0.0),
        (0, 1, "view", 0.0),  # other key: own island chain
    ]
    out = {
        (r.user_id, r.event_type, r.island_idx): r
        for r in debounce(_ev(spark, rows), threshold_us=60_000_000).collect()
    }
    first = out[(1, "click", 1)]
    assert (first.n_events, first.span_us, first.lead_gap_us) == (
        3, 20_000_000, -1,
    )
    second = out[(1, "click", 2)]
    assert (second.n_events, second.span_us) == (1, 0)
    assert second.lead_gap_us == (7200 - 20) * 1_000_000
    assert out[(1, "view", 1)].n_events == 1
    assert len(out) == 3


def test_debounce_exact_threshold_keeps_island(spark):
    # gap == threshold stays collapsed (<=, not <)
    rows = [(0, 1, "click", 0.0), (60, 1, "click", 0.0)]
    out = debounce(_ev(spark, rows), threshold_us=60_000_000).collect()
    assert len(out) == 1 and out[0].n_events == 2
