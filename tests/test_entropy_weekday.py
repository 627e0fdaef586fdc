"""Token-entropy statistics (textstats.token_entropy) and weekday
profile (asof.weekday_profile) tests."""

import datetime
import math

from unsupervised_ner_spark.ops.asof import weekday_profile
from unsupervised_ner_spark.ops.textstats import token_entropy


def test_token_entropy_exact_statistics(spark):
    d = spark.createDataFrame(
        [(0, "a a b"), (1, "x x x x")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in token_entropy(d).collect()}
    assert (out[0].n_tokens, out[0].n_types) == (3, 2)
    assert out[0].clnc_i9_sum == round(2 * math.log(2) * 1e9)  # c=1 adds 0
    # single repeated token: H = ln(n) - S/(n*1e9) must equal 0 exactly
    assert (out[1].n_tokens, out[1].n_types) == (4, 1)
    assert out[1].clnc_i9_sum == round(4 * math.log(4) * 1e9)


def test_weekday_profile_monday_anchor_and_dev(spark):
    # 2024-01-01 is a Monday -> dow 0; 7 events Mon + 7 Tue for type A
    # gives dev = 7*7 - 14 = 35 on each, share 500000 ppm.
    rows = []
    for i in range(7):
        rows.append((i, datetime.datetime(2024, 1, 1, i), 1, "A"))
        rows.append((100 + i, datetime.datetime(2024, 1, 2, i), 1, "A"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r.dow: r for r in weekday_profile(ev).collect()}
    assert set(out) == {0, 1}
    assert out[0].n_events == 7 and out[1].n_events == 7
    assert out[0].dev_7c_total == 7 * 7 - 14
    assert out[0].share_ppm == 500_000


def test_weekday_profile_uniform_week_zero_dev(spark):
    # one event each day of one week: dev exactly 0 for all 7 rows.
    rows = [
        (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(days=i), 1, "B")
        for i in range(7)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = weekday_profile(ev).collect()
    assert len(out) == 7 and all(r.dev_7c_total == 0 for r in out)
