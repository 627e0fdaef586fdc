"""Exact-substring run dedup (dedup.shared_substring_runs) and
distant-supervision type inference (er.type_inference) branch tests."""

from pyspark.sql import functions as F

from unsupervised_ner_spark.ops.dedup import shared_substring_runs
from unsupervised_ner_spark.pipeline.er import type_inference


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_substring_runs_maximal_coalescing(spark):
    # docs 0 and 1 share one 7-token run ("r1 .. r7") at different offsets;
    # with k=4 that is 4 consecutive anchors on one diagonal -> ONE
    # maximal row of run_len 7, never four window-sized rows.
    shared = "r1 r2 r3 r4 r5 r6 r7"
    docs = _docs(
        spark,
        [
            "x1 x2 " + shared + " x3",
            "y1 " + shared + " y2 y3 y4",
            "z1 z2 z3 z4 z5 z6 z7 z8",
        ],
    )
    rows = shared_substring_runs(docs, k=4, min_len=6).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (0, 1)
    assert (r.pos_a, r.pos_b, r.run_len) == (3, 2, 7)


def test_substring_runs_two_separate_runs_and_min_len(spark):
    # one pair, two disjoint shared passages -> two rows; a 4-token
    # shared window alone (run_len 4 < min_len 6) is filtered.
    a = "p1 p2 p3 p4 p5 p6 mid1 mid2 q1 q2 q3 q4 q5 q6 q7 tail"
    b = "k1 p1 p2 p3 p4 p5 p6 other q1 q2 q3 q4 q5 q6 q7 k2 s1 s2 s3 s4"
    c = "s1 s2 s3 s4 w w2 w3 w4 w5 w6 w7 w8"
    out = shared_substring_runs(_docs(spark, [a, b, c]), k=4, min_len=6)
    rows = {(r.doc_a, r.doc_b, r.pos_a, r.pos_b, r.run_len) for r in out.collect()}
    assert rows == {(0, 1, 1, 2, 6), (0, 1, 9, 9, 7)}


def test_substring_runs_max_occ_cap(spark):
    # the same 6-token passage in 4 docs; max_occ=3 excludes its windows
    # entirely (df-cap), so no runs survive.
    shared = "c1 c2 c3 c4 c5 c6"
    docs = _docs(spark, [f"u{i} " + shared for i in range(4)])
    assert shared_substring_runs(docs, k=4, min_len=6, max_occ=3).count() == 0
    # with the cap lifted all 6 pairs appear
    assert shared_substring_runs(docs, k=4, min_len=6, max_occ=100).count() == 6


def _typed(spark, rows):
    return spark.createDataFrame(
        rows, "url string, sent_idx long, surface string, pred_group string"
    )


def test_type_inference_majority_and_tiebreak(spark):
    rows = [
        # 'mystery' is OTHER everywhere; co-occurs with PERSON twice,
        # DISEASE once -> PERSON wins on votes.
        ("u1", 0, "Mystery", "OTHER"),
        ("u1", 0, "Alice", "PERSON"),
        ("u2", 0, "Mystery", "OTHER"),
        ("u2", 0, "Bob", "PERSON"),
        ("u2", 0, "Flu", "DISEASE"),
        # 'tied' sees one DISEASE and one PERSON -> type ASC tie-break.
        ("u3", 0, "tied", "OTHER"),
        ("u3", 0, "Carol", "PERSON"),
        ("u3", 1, "tied", "OTHER"),
        ("u3", 1, "Gout", "DISEASE"),
        # 'known' tags OTHER here but PERSON elsewhere -> excluded.
        ("u4", 0, "known", "OTHER"),
        ("u4", 0, "Dave", "PERSON"),
        ("u5", 0, "known", "PERSON"),
    ]
    out = {r.ent: r for r in type_inference(_typed(spark, rows)).collect()}
    assert set(out) == {"mystery", "tied"}
    m = out["mystery"]
    assert (m.inferred_type, m.top_votes, m.n_votes, m.n_types_voted) == (
        "PERSON", 2, 3, 2,
    )
    t = out["tied"]
    assert (t.inferred_type, t.top_votes, t.n_votes) == ("DISEASE", 1, 2)


def test_type_inference_distinct_per_sentence(spark):
    # duplicate mention rows in ONE sentence count once (distinct events).
    rows = [
        ("u1", 0, "blob", "OTHER"),
        ("u1", 0, "blob", "OTHER"),
        ("u1", 0, "Eve", "PERSON"),
        ("u1", 0, "Eve", "PERSON"),
    ]
    out = type_inference(_typed(spark, rows)).collect()
    assert len(out) == 1 and out[0].n_votes == 1
