"""Unit tests: pronoun coreference (pipeline/coref.py), temporal
expression extraction (ops/webtext.extract_dates), and local clustering
coefficients (pipeline/er.clustering_coefficients)."""

from __future__ import annotations

from unsupervised_ner_spark.ops import webtext
from unsupervised_ner_spark.pipeline import er
from unsupervised_ner_spark.pipeline.coref import resolve_pronouns


def _mentions(spark, rows):
    return spark.createDataFrame(
        rows,
        "url string, sent_idx long, mention_idx long, surface string, "
        "pred_group string",
    )


def _prons(spark, rows):
    return spark.createDataFrame(
        rows, "url string, sent_idx long, tok_idx long, pronoun string"
    )


def test_coref_type_agreement_and_recency(spark):
    ments = _mentions(
        spark,
        [
            ("d1", 0, 0, "paris", "LOCATION"),
            ("d1", 1, 0, "alice", "PERSON"),
            ("d1", 1, 1, "bob", "PERSON"),
            ("d1", 2, 0, "junk", "OTHER"),
        ],
    )
    prons = _prons(
        spark,
        [
            ("d1", 3, 0, "he"),   # -> bob (sent 1 nearest PERSON, last mention)
            ("d1", 3, 1, "it"),   # -> paris (sent 1 PERSONs rejected, OTHER skipped)
            ("d1", 3, 2, "they"), # -> bob (any group, nearest sentence wins)
        ],
    )
    got = {
        (r.pronoun, r.tok_idx): (r.antecedent, r.antecedent_type,
                                 r.ant_sent_idx, r.back_dist)
        for r in resolve_pronouns(prons, ments).collect()
    }
    assert got[("he", 0)] == ("bob", "PERSON", 1, 2)
    assert got[("it", 1)] == ("paris", "LOCATION", 0, 3)
    assert got[("they", 2)] == ("bob", "PERSON", 1, 2)


def test_coref_window_and_unresolved(spark):
    ments = _mentions(spark, [("d1", 0, 0, "alice", "PERSON")])
    prons = _prons(
        spark,
        [
            ("d1", 4, 0, "he"),   # 4 back > max_back=3 -> unresolved
            ("d1", 3, 0, "he"),   # exactly max_back -> resolved
            ("d1", 3, 1, "it"),   # PERSON incompatible -> unresolved
            ("d2", 3, 0, "he"),   # other doc -> unresolved
            ("d1", 0, 0, "he"),   # same sentence is NOT an antecedent
        ],
    )
    rows = resolve_pronouns(prons, ments).collect()
    assert [(r.url, r.sent_idx, r.tok_idx, r.back_dist) for r in rows] == [
        ("d1", 3, 0, 3)
    ]


def test_extract_dates_families_and_normalization(spark):
    df = spark.createDataFrame(
        [
            (1, "released on 2021-07-09 and again on 1999-12-31 ok"),
            (2, "announced on March 5, 1999 then December 25, 2020 ."),
            (3, "nothing here"),
            (4, "mixed 2000-01-02 and May 7, 2001 ."),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r.doc_id, r.kind, r.date_iso, r.raw)
        for r in webtext.extract_dates(df).collect()
    )
    assert got == [
        (1, "iso", "1999-12-31", "1999-12-31"),
        (1, "iso", "2021-07-09", "2021-07-09"),
        (2, "text", "1999-03-05", "March 5, 1999"),
        (2, "text", "2020-12-25", "December 25, 2020"),
        (4, "iso", "2000-01-02", "2000-01-02"),
        (4, "text", "2001-05-07", "May 7, 2001"),
    ]


def test_clustering_coefficients_triangle_plus_pendant(spark):
    # triangle a-b-c plus pendant edge a-d: coeff(a) = 2*1/(3*2),
    # coeff(b) = coeff(c) = 2*1/(2*1) = 1, coeff(d) undefined (den 0)
    edges = spark.createDataFrame(
        [
            ("a", "T", "b", "T"),
            ("a", "T", "c", "T"),
            ("b", "T", "c", "T"),
            ("a", "T", "d", "T"),
        ],
        "ent_a string, type_a string, ent_b string, type_b string",
    )
    got = {
        r.ent: (r.degree, r.n_tri, r.coeff_num, r.coeff_den)
        for r in er.clustering_coefficients(edges).collect()
    }
    assert got == {
        "a": (3, 1, 2, 6),
        "b": (2, 1, 2, 2),
        "c": (2, 1, 2, 2),
        "d": (1, 0, 0, 0),
    }


def test_extract_tables_kv_and_edges(spark):
    html = (
        "pre <table><tr><th>Name</th><td><b>Ada</b> Lovelace</td></tr>"
        "<tr><td>solo</td></tr>"
        "<tr><td>Born</td><td>1815</td><td>London</td></tr></table>"
        " mid <TABLE border=1><TR><TD>k</TD><TD>v</TD></TR></TABLE> post"
    )
    df = spark.createDataFrame(
        [(1, html), (2, "no tables at all")], "doc_id long, text string"
    )
    got = sorted(
        (r.doc_id, r.table_idx, r.row_idx, r.key, r.value, r.n_cells)
        for r in webtext.extract_tables(df).collect()
    )
    # single-cell spanner row dropped; inner tags stripped; 3-cell row
    # keeps its first two cells with n_cells=3; uppercase tags match (?i)
    assert got == [
        (1, 0, 0, "Name", "Ada Lovelace", 2),
        (1, 0, 2, "Born", "1815", 3),
        (1, 1, 0, "k", "v", 2),
    ]


def test_fact_certainty_precedence_and_cues(spark):
    from unsupervised_ner_spark.pipeline.triples import fact_certainty

    trips = spark.createDataFrame(
        [
            ("d", 0, "a", "T", "treats", "b", "T"),
            ("d", 0, "a", "T", "may not treat", "b", "T"),   # neg beats hedge
            ("d", 0, "a", "T", "without nor", "b", "T"),     # min cue = nor
            ("d", 0, "a", "T", "possibly likely", "b", "T"), # min cue = likely
        ],
        "url string, sent_idx long, subj string, subj_type string, "
        "pred_norm string, obj string, obj_type string",
    )
    got = {r.pred_norm: (r.certainty, r.cue)
           for r in fact_certainty(trips).collect()}
    assert got["treats"] == ("asserted", "")
    assert got["may not treat"] == ("negated", "not")
    assert got["without nor"] == ("negated", "nor")
    assert got["possibly likely"] == ("hedged", "likely")


def test_wl_colors_path_graph_md5_replication(spark):
    import hashlib

    # path a-b-c: endpoints are WL-equivalent, the middle is not
    edges = spark.createDataFrame(
        [("a", "T", "b", "T"), ("b", "T", "c", "T")],
        "ent_a string, type_a string, ent_b string, type_b string",
    )
    got = {r.ent: r.wl_color for r in er.wl_colors(edges, rounds=2).collect()}

    def h(color, sig):
        return hashlib.md5(f"{color}|{sig}".encode()).hexdigest()[:8]

    deg1_r1 = h("0", "0")          # one neighbor
    deg2_r1 = h("0", "0,0")        # two neighbors
    assert got["a"] == got["c"] == h(deg1_r1, deg2_r1)
    assert got["b"] == h(deg2_r1, ",".join(sorted([deg1_r1, deg1_r1])))
    assert got["a"] != got["b"]


def test_skyline2d_dominance_and_counts(spark):
    from unsupervised_ner_spark.ops.curation import skyline2d

    rows = [(1, 5), (1, 5), (1, 7), (2, 3), (3, 3), (3, 9), (4, 1)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = sorted((r.x, r.y, r.n_rows) for r in skyline2d(df, "x", "y").collect())
    # (1,7) dominated by (1,5); (3,3) dominated by (2,3) (equal y,
    # smaller x); (3,9) dominated by everything cheaper
    assert got == [(1, 5, 2), (2, 3, 1), (4, 1, 1)]


def test_frequent_itemsets3_apriori(spark):
    from unsupervised_ner_spark.pipeline.er import frequent_itemsets3

    sents = {
        ("d1", 0): ["aa", "bb", "cc"],
        ("d1", 1): ["aa", "bb", "cc", "dd"],
        ("d2", 0): ["aa", "bb", "dd"],
    }
    rows = [
        (url, s, ent, "T")
        for (url, s), ents in sents.items()
        for ent in ents
    ]
    df = spark.createDataFrame(
        rows, "url string, sent_idx long, surface string, pred_group string"
    )
    got = sorted(
        (r.ent_a, r.ent_b, r.ent_c, r.support)
        for r in frequent_itemsets3(df, minsup=2).collect()
    )
    # abc in 2 sentences, abd in 2; acd/bcd only once (cd pair infrequent)
    assert got == [("aa", "bb", "cc", 2), ("aa", "bb", "dd", 2)]


def test_nominal_coref_group_equality(spark):
    from unsupervised_ner_spark.pipeline.coref import resolve_definite_nps

    ments = _mentions(
        spark,
        [
            ("d1", 0, 0, "aspirin", "THERAPEUTIC_OR_PREVENTIVE_PROCEDURE"),
            ("d1", 1, 0, "flu", "DISEASE"),
            ("d1", 1, 1, "malaria", "DISEASE"),
        ],
    )
    nps = spark.createDataFrame(
        [
            ("d1", 2, 0, "DISEASE"),     # -> malaria (latest in sent 1)
            ("d1", 2, 1, "THERAPEUTIC_OR_PREVENTIVE_PROCEDURE"),  # -> aspirin
            ("d1", 2, 2, "MEASURE"),     # no such mention -> unresolved
        ],
        "url string, sent_idx long, tok_idx long, np_group string",
    )
    got = {
        r.tok_idx: (r.antecedent, r.ant_sent_idx, r.back_dist)
        for r in resolve_definite_nps(nps, ments).collect()
    }
    assert got == {0: ("malaria", 1, 1), 1: ("aspirin", 0, 2)}
