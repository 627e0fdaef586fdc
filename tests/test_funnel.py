"""Ordered conversion funnel (ops/asof.py funnel_steps) branch tests:
strict after-ordering, equal-timestamp tie handling, partial funnels,
and the no-step-1 exclusion."""

from datetime import datetime

from unsupervised_ner_spark.ops.asof import funnel_steps


def _events(spark, rows):
    # rows: (event_id, second, user_id, event_type) — micros = second * 1e6
    return spark.createDataFrame(
        [(eid, datetime(2024, 1, 1, 0, 0, s), uid, et)
         for eid, s, uid, et in rows],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_full_funnel_and_gaps(spark):
    ev = _events(spark, [
        (1, 0, 1, "view"),
        (2, 5, 1, "click"),
        (3, 12, 1, "purchase"),
        # later duplicates must not move the earliest-step choice
        (4, 20, 1, "click"),
        (5, 30, 1, "purchase"),
    ])
    got = funnel_steps(ev).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.user_id, r.reached_step) == (1, 3)
    assert (r.gap12_us, r.gap23_us) == (5_000_000, 7_000_000)


def test_strictly_after_not_at_or_before(spark):
    # click AT the view timestamp and purchase BEFORE the click do not
    # count — the funnel is strict event-time order
    ev = _events(spark, [
        (1, 10, 1, "view"),
        (2, 10, 1, "click"),      # same instant: NOT after the view
        (3, 50, 1, "click"),      # this one counts
        (4, 20, 1, "purchase"),   # before the counting click: ignored
    ])
    r = funnel_steps(ev).collect()[0]
    assert (r.reached_step, r.gap12_us, r.gap23_us) == (2, 40_000_000, -1)


def test_partial_and_absent_users(spark):
    ev = _events(spark, [
        (1, 0, 1, "view"),                       # stops at step 1
        (2, 0, 2, "view"), (3, 9, 2, "click"),   # stops at step 2
        (4, 3, 3, "click"), (5, 8, 3, "purchase"),  # no view: absent
    ])
    got = {r.user_id: r for r in funnel_steps(ev).collect()}
    assert set(got) == {1, 2}
    assert (got[1].reached_step, got[1].gap12_us, got[1].gap23_us) == (1, -1, -1)
    assert (got[2].reached_step, got[2].gap12_us, got[2].gap23_us) == (2, 9_000_000, -1)


def test_custom_steps_and_earliest_step1(spark):
    # two step-1 events: the EARLIEST anchors the funnel even though the
    # later one would yield a longer chain only if min were wrong
    ev = _events(spark, [
        (1, 0, 7, "signup"),
        (2, 30, 7, "signup"),
        (3, 10, 7, "error"),
    ])
    r = funnel_steps(ev, steps=("signup", "error")).collect()[0]
    assert (r.reached_step, r.gap12_us) == (2, 10_000_000)
