"""Parallel greedy maximal matching (er.maximal_matching), cohort
retention (asof.retention_cohorts), and vocabulary drift
(textstats.vocab_drift) branch + property tests."""

import hashlib
from datetime import datetime

from unsupervised_ner_spark.ops.asof import retention_cohorts
from unsupervised_ner_spark.ops.textstats import vocab_drift
from unsupervised_ner_spark.pipeline.er import maximal_matching


def _prio(ekey: str) -> int:
    return int(hashlib.md5(ekey.encode()).hexdigest()[:8], 16)


def _ref_matching(pairs, rounds):
    """Python replication of the per-round local-min rule."""
    alive = {f"{a}|T|{b}|T": (a, b) for a, b in pairs}
    out = {}
    for r in range(1, rounds + 1):
        order = {k: (_prio(k), k) for k in alive}
        win = set()
        for k, (a, b) in alive.items():
            if not any(
                o != k and order[o] < order[k]
                and ({a, b} & set(alive[o]))
                for o in alive
            ):
                win.add(k)
        mnodes = {n for k in win for n in alive[k]}
        drop = {
            k for k in alive
            if k not in win and (set(alive[k]) & mnodes)
        }
        for k in win:
            out[k] = ("matched", r)
        for k in drop:
            out[k] = ("dropped", r)
        alive = {k: v for k, v in alive.items() if k not in out}
    for k in alive:
        out[k] = ("open", rounds)
    return out


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, "T", b, "T") for a, b in pairs],
        "ent_a string, type_a string, ent_b string, type_b string",
    )


# 3x3 grid: the md5 priorities leave open edges after round 1 AND a
# round-2 drop (verified by the in-test precondition asserts below)
GRID = [(f"g{i}{j}", f"g{i + 1}{j}") for i in range(2) for j in range(3)] + [
    (f"g{i}{j}", f"g{i}{j + 1}") for i in range(3) for j in range(2)
]
STAR = [("hub", f"s{i}") for i in range(5)]
TRI = [("x", "y"), ("y", "z"), ("x", "z")]


def test_matching_replicates_python_per_round(spark):
    pairs = GRID + STAR + TRI
    for rounds in (1, 3):
        ref = _ref_matching(pairs, rounds)
        got = {
            f"{r.ent_a}|{r.type_a}|{r.ent_b}|{r.type_b}": (r.status, r.round)
            for r in maximal_matching(_edges(spark, pairs), rounds=rounds)
            .collect()
        }
        assert got == ref
    # the grid needs >1 round: open AND dropped@2 branches are real here
    r1 = _ref_matching(GRID, 1)
    assert any(v[0] == "open" for v in r1.values())
    r3 = _ref_matching(GRID, 3)
    assert any(v == ("dropped", 2) for v in r3.values())


def test_matching_valid_and_maximal_at_fixpoint(spark):
    pairs = GRID + STAR + TRI
    rows = maximal_matching(_edges(spark, pairs), rounds=6).collect()
    assert all(r.status != "open" for r in rows)
    matched = [(r.ent_a, r.ent_b) for r in rows if r.status == "matched"]
    used = [n for e in matched for n in e]
    assert len(used) == len(set(used))  # a matching: no shared endpoint
    # maximal: every non-matched edge touches a matched node
    for r in rows:
        if r.status != "matched":
            assert r.ent_a in set(used) or r.ent_b in set(used)
    # Blelloch-Fineman-Shun: fixpoint == SEQUENTIAL greedy in prio order
    greedy, taken = set(), set()
    for k, (a, b) in sorted(
        ((f"{a}|T|{b}|T", (a, b)) for a, b in pairs),
        key=lambda kv: (_prio(kv[0]), kv[0]),
    ):
        if not ({a, b} & taken):
            greedy.add(k)
            taken |= {a, b}
    eng = {
        f"{r.ent_a}|T|{r.ent_b}|T" for r in rows if r.status == "matched"
    }
    assert eng == greedy


def _events(spark, rows):
    # rows: (user_id, month, day)
    return spark.createDataFrame(
        [(i, datetime(2024, m, d, 12, 0, 0), uid, "view")
         for i, (uid, m, d) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_retention_cohorts_matrix(spark):
    # 2024-01-01 is day 19723 -> week 2817 (19723 // 7)
    ev = _events(spark, [
        (1, 1, 1), (1, 1, 10), (1, 1, 17),   # weeks 2817, 2818, 2819
        (2, 1, 2), (2, 1, 3),                # week 2817 twice (dedup)
        (3, 1, 10),                          # late cohort, week 2818
    ])
    got = {(r.cohort_period, r.period_offset):
           (r.n_users, r.cohort_size, r.retention_ppm)
           for r in retention_cohorts(ev, period_days=7).collect()}
    assert got == {
        (2817, 0): (2, 2, 1_000_000),
        (2817, 1): (1, 2, 500_000),
        (2817, 2): (1, 2, 500_000),
        (2818, 0): (1, 1, 1_000_000),
    }


def test_vocab_drift_classes_and_exact_boundary(spark):
    # A = doc 0 (even), B = doc 1 (odd); 8 tokens per side so the totals
    # are equal and cross-multiplication reduces to count comparison
    docs = spark.createDataFrame(
        [(0, "base base gone up down down down fill"),
         (1, "base base new up up up down fill")],
        "doc_id long, text string",
    )
    got = {r.tok: (r.n_a, r.n_b, r.drift)
           for r in vocab_drift(docs, ratio_num=2).collect()}
    assert got["gone"] == (1, 0, "gone")
    assert got["new"] == (0, 1, "new")
    assert got["up"] == (1, 3, "up")       # 3x > 2x threshold
    assert got["down"] == (3, 1, "down")
    assert got["base"] == (2, 2, "stable")
    # EXACTLY 2x is stable — the comparison is strict
    assert got["fill"] == (1, 1, "stable")
    docs2 = spark.createDataFrame(
        [(0, "t pad pad pad"), (1, "t t pad pad")],
        "doc_id long, text string",
    )
    got2 = {r.tok: r.drift for r in vocab_drift(docs2, ratio_num=2).collect()}
    assert got2["t"] == "stable"  # 2:1 at equal totals = the boundary
