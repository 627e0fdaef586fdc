"""As-of join semantics: most-recent-preceding match, exact-timestamp
inclusion, deterministic equal-ts tie-break (largest tie wins), and NULL
for left rows with no preceding right row."""

from datetime import datetime

from unsupervised_ner_spark.ops.asof import asof_join


def ts(m, s=0):
    return datetime(2024, 1, 1, 0, m, s)


def test_asof_join_semantics(spark):
    clicks = spark.createDataFrame(
        [
            (100, 1, ts(5)),   # after views at 1 and 3 -> view 12
            (101, 1, ts(3)),   # EXACT same ts as view 12 -> matches it
            (102, 1, ts(0)),   # before any view -> NULL
            (103, 2, ts(9)),   # user 2: two views at the same ts -> larger id 22
            (104, 3, ts(4)),   # user 3 has no views at all -> NULL
        ],
        "event_id long, user_id long, ts timestamp",
    )
    views = spark.createDataFrame(
        [
            (11, 1, ts(1)),
            (12, 1, ts(3)),
            (21, 2, ts(8)),
            (22, 2, ts(8)),   # equal-ts tie with 21 -> 22 wins (largest tie)
        ],
        "event_id long, user_id long, ts timestamp",
    )
    out = asof_join(
        clicks, views, on=["user_id"], left_ts="ts", right_ts="ts",
        left_cols=["event_id", "ts"], right_cols=["event_id", "ts"],
        right_tie="event_id",
    )
    got = {r.event_id: (r.r_event_id, r.r_ts) for r in out.collect()}
    assert got[100] == (12, ts(3))
    assert got[101] == (12, ts(3))
    assert got[102] == (None, None)
    # user 2 click at 0:09 sees both 0:08 views; tie resolves to id 22
    assert got[103] == (22, ts(8))
    assert got[104] == (None, None)
    assert len(got) == 5  # every left row survives exactly once


def test_asof_join_plan_has_no_range_join(spark):
    """The operator must plan as exchange+sort+window — never a broadcast
    nested-loop / cartesian range join."""
    clicks = spark.createDataFrame([(1, 1, ts(1))], "event_id long, user_id long, ts timestamp")
    views = spark.createDataFrame([(2, 1, ts(0))], "event_id long, user_id long, ts timestamp")
    out = asof_join(
        clicks, views, on=["user_id"], left_ts="ts", right_ts="ts",
        left_cols=["event_id"], right_cols=["event_id"], right_tie="event_id",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan
