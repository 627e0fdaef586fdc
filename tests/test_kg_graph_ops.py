"""Unit tests for the KG graph analytics operators (pipeline/er.py:
triple_support, entity_aliases, to_ntriples, triangles) and PII redaction
(ops/textstats.py redact_pii) — small hand-built frames with known-by-hand
expected outputs; the corpus-scale parity gate is check_correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from unsupervised_ner_spark.ops.textstats import redact_pii
from unsupervised_ner_spark.pipeline import er


def _trips(spark):
    rows = [
        # (subj_id, pred, obj_id, url, sent_idx, subj, subj_type, obj, obj_type)
        ("e1", "causes", "e2", "u1", 0, "Asbestos", "SUBSTANCE", "cancer", "DISEASE"),
        ("e1", "causes", "e2", "u1", 3, "asbestos", "SUBSTANCE", "Cancer", "DISEASE"),
        ("e1", "causes", "e2", "u2", 0, "ASBESTOS", "SUBSTANCE", "cancer", "DISEASE"),
        ("e3", "treats", "e2", "u2", 1, "Imatinib", "DRUG", "cancer", "DISEASE"),
    ]
    return spark.createDataFrame(
        rows,
        "subj_id string, pred string, obj_id string, url string, "
        "sent_idx long, subj string, subj_type string, obj string, obj_type string",
    )


def test_triple_support(spark):
    out = {
        (r.subj_id, r.pred, r.obj_id): r
        for r in er.triple_support(_trips(spark)).collect()
    }
    a = out[("e1", "causes", "e2")]
    assert a.n_support == 3 and a.n_docs == 2
    # min() representative: 'ASBESTOS' < 'Asbestos' < 'asbestos' in ASCII
    assert a.subj_repr == "ASBESTOS" and a.obj_repr == "Cancer"
    b = out[("e3", "treats", "e2")]
    assert b.n_support == 1 and b.n_docs == 1 and b.subj_type == "DRUG"


def test_to_ntriples_slug_and_fallback(spark):
    df = spark.createDataFrame(
        [
            ("a" * 4, "was treated for", "b" * 4, "u1", 0),
            ("a" * 4, "', of &", "b" * 4, "u1", 1),  # slugs to empty -> fallback
        ],
        "subj_id string, pred string, obj_id string, url string, sent_idx long",
    )
    lines = [r.ntriple for r in er.to_ntriples(df).orderBy("sent_idx").collect()]
    assert lines[0] == "<urn:kg:e:aaaa> <urn:kg:r:was_treated_for> <urn:kg:e:bbbb> ."
    assert lines[1] == "<urn:kg:e:aaaa> <urn:kg:r:of> <urn:kg:e:bbbb> ."


def test_triangles_exactly_once_and_no_false_positive(spark):
    # graph: a-b, b-c, a-c (triangle), c-d, a-d (a-c-d NOT closed: c-d,a-d
    # but a-c yes -> a,c,d IS a triangle iff all three edges exist: a-c,
    # c-d, a-d all present -> two triangles; b-d absent so a,b,d is not.
    edges = spark.createDataFrame(
        [
            ("a", "T", "b", "T", 1, 1),
            ("b", "T", "c", "T", 1, 1),
            ("a", "T", "c", "T", 1, 1),
            ("c", "T", "d", "T", 1, 1),
            ("a", "T", "d", "T", 1, 1),
        ],
        "ent_a string, type_a string, ent_b string, type_b string, "
        "n_sents long, n_docs long",
    )
    tri = {
        (r.ent_a, r.ent_b, r.ent_c) for r in er.triangles(edges).collect()
    }
    assert tri == {("a", "b", "c"), ("a", "c", "d")}
    # each triangle exactly once (canonical orientation, no /6 duplicates)
    assert er.triangles(edges).count() == 2


def test_triangles_type_in_key(spark):
    # same surface, different etype = different node; no triangle closes
    edges = spark.createDataFrame(
        [
            ("x", "DRUG", "y", "T", 1, 1),
            ("y", "T", "z", "T", 1, 1),
            ("x", "DISEASE", "z", "T", 1, 1),
        ],
        "ent_a string, type_a string, ent_b string, type_b string, "
        "n_sents long, n_docs long",
    )
    assert er.triangles(edges).count() == 0


def test_triangles_degree_orientation_equals_lex(spark):
    # deterministic pseudo-random graph with a hub (skew case): node h
    # connects to everything; plus a ring with chords
    import hashlib

    n = 14
    nodes = [f"n{i:02d}" for i in range(n)]
    pairs = set()
    for i in range(1, n):
        pairs.add((nodes[0], nodes[i]))  # hub
    for i in range(1, n):
        j = 1 + (i % (n - 1))
        a, b = sorted((nodes[i], nodes[j]))
        if a != b:
            pairs.add((a, b))
    for i in range(1, n):  # hash-derived chords
        h = int(hashlib.md5(str(i).encode()).hexdigest(), 16)
        j = 1 + (h % (n - 1))
        a, b = sorted((nodes[i], nodes[j]))
        if a != b:
            pairs.add((a, b))
    edges = spark.createDataFrame(
        [(a, "T", b, "T", 1, 1) for a, b in sorted(pairs)],
        "ent_a string, type_a string, ent_b string, type_b string, "
        "n_sents long, n_docs long",
    )
    key = lambda r: (r.ent_a, r.ent_b, r.ent_c)  # noqa: E731
    lex = {key(r) for r in er.triangles(edges, orient="lex").collect()}
    deg = {key(r) for r in er.triangles(edges, orient="degree").collect()}
    assert lex == deg and len(lex) > 5
    # exactly-once in both orientations
    assert er.triangles(edges, orient="degree").count() == len(deg)


def test_entity_aliases_rank(spark):
    occ = spark.createDataFrame(
        [
            ("o1", "u1", "Covid", "covid", "DISEASE"),
            ("o2", "u1", "Covid", "covid", "DISEASE"),
            ("o3", "u2", "COVID", "covid", "DISEASE"),
            ("o4", "u2", "covid 19", "covid 19", "DISEASE"),
        ],
        "occurrence_id string, url string, surface string, "
        "norm_surface string, etype string",
    )
    memb = spark.createDataFrame(
        [("covid", "DISEASE", "E1"), ("covid 19", "DISEASE", "E1")],
        "norm_surface string, etype string, entity_id string",
    )
    out = er.entity_aliases(occ, memb).orderBy("rank").collect()
    assert [(r.alias, r.n_mentions, r.rank) for r in out] == [
        ("Covid", 2, 1),  # dominant form
        ("COVID", 1, 2),  # count tie vs 'covid 19' -> surface asc
        ("covid 19", 1, 3),
    ]
    assert all(r.entity_id == "E1" for r in out)


def test_redact_pii_stages(spark):
    df = spark.createDataFrame(
        [
            (0, "mail bob.smith+x@corp.example.org now"),
            (1, "call 555-0199 or 020-12345 today"),
            (2, "release v2 build 2024 has 3 fixes"),
            (3, "clean text without any pii at all"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert out[0].red_text == "mail <EMAIL> now"
    assert (out[0].n_emails, out[0].n_phones, out[0].n_nums) == (1, 0, 0)
    assert out[1].red_text == "call <PHONE> or <PHONE> today"
    assert (out[1].n_emails, out[1].n_phones, out[1].n_nums) == (0, 2, 0)
    # digits not phone/email-shaped fall through to <NUM>
    assert out[2].red_text == "release v<NUM> build <NUM> has <NUM> fixes"
    assert (out[2].n_emails, out[2].n_phones, out[2].n_nums) == (0, 0, 3)
    assert out[3].red_text == out[3].text and out[3].n_nums == 0


def test_redact_email_digits_not_double_counted(spark):
    df = spark.createDataFrame(
        [(0, "u123@x42.example.com and 7 more")], "doc_id long, text string"
    )
    r = redact_pii(df).collect()[0]
    # the email's digits are consumed by <EMAIL>; only '7' remains a number
    assert r.red_text == "<EMAIL> and <NUM> more"
    assert (r.n_emails, r.n_phones, r.n_nums) == (1, 0, 1)


def test_common_neighbors_counts_and_linked(spark):
    # path graph + one closing edge: a-b, b-c, a-c, c-d
    edges = spark.createDataFrame(
        [
            ("a", "T", "b", "T", 1, 1),
            ("b", "T", "c", "T", 1, 1),
            ("a", "T", "c", "T", 1, 1),
            ("c", "T", "d", "T", 1, 1),
        ],
        "ent_a string, type_a string, ent_b string, type_b string, "
        "n_sents long, n_docs long",
    )
    rows = {
        (r.ent_x, r.ent_y): r
        for r in er.common_neighbors(edges, max_degree=100).collect()
    }
    # (a, b): common neighbor c; both also adjacent -> linked=1
    ab = rows[("a", "b")]
    assert (ab.n_common, ab.linked, ab.deg_x, ab.deg_y) == (1, 1, 2, 2)
    # (b, d): common neighbor c; NOT adjacent -> the link-prediction row
    bd = rows[("b", "d")]
    assert (bd.n_common, bd.linked, bd.deg_y) == (1, 0, 1)
    # (a, d): common neighbor c, not adjacent
    assert rows[("a", "d")].linked == 0


def test_common_neighbors_degree_cap_excludes_hub_witness(spark):
    # hub h adjacent to x, y, z; no other edges. With the hub admitted,
    # every pair has 1 common neighbor; with cap=2 (< deg(h)=3) the hub
    # cannot act as witness and NO pair survives.
    edges = spark.createDataFrame(
        [
            ("h", "T", "x", "T", 1, 1),
            ("h", "T", "y", "T", 1, 1),
            ("h", "T", "z", "T", 1, 1),
        ],
        "ent_a string, type_a string, ent_b string, type_b string, "
        "n_sents long, n_docs long",
    )
    assert er.common_neighbors(edges, max_degree=100).count() == 3
    assert er.common_neighbors(edges, max_degree=2).count() == 0


def test_length_percentiles_discrete_picks(spark):
    from unsupervised_ner_spark.ops.textstats import length_percentiles

    docs = [(i, " ".join(["w"] * n), "en") for i, n in enumerate(
        [1, 2, 3, 4, 5, 6, 7, 8, 9, 10])]
    docs += [(100, "a b c", "de")]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    out = {(r.lang, r.pct): r for r in length_percentiles(df).collect()}
    # en: n=10 -> rank ceil(.1*10)=1 -> 1 token; p50 -> rank 5 -> 5; p90 -> rank 9 -> 9
    assert out[("en", 10)].n_tokens == 1
    assert out[("en", 50)].n_tokens == 5
    assert out[("en", 90)].n_tokens == 9
    assert out[("en", 50)].n_docs == 10
    # de: single doc -> every percentile picks it
    assert all(out[("de", p)].n_tokens == 3 for p in (10, 50, 90))
