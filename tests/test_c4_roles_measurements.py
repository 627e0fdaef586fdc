"""C4 named rules (textstats.c4_filters), role-pattern facts
(triples.role_pattern_facts), and measurement extraction
(triples.measurement_facts) branch tests."""

from unsupervised_ner_spark.ops.textstats import c4_filters
from unsupervised_ner_spark.pipeline.triples import (
    measurement_facts,
    role_pattern_facts,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _sents(spark, rows):
    return spark.createDataFrame(
        rows, "url string, sent_idx long, sent string"
    )


def test_c4_rules_and_line_stats(spark):
    texts = [
        "a good long line with many words here",          # keep
        "short\nthis is lorem ipsum filler text",          # lorem kill
        "code sample { x }\nanother good long line here",  # brace kill
        "read the privacy policy now please today",        # policy kill
        "tiny doc",                                        # f_minlines kill
        "Line one ends well.\nsecond line has five words",  # terminal punct
    ]
    got = {
        r.doc_id: r
        for r in c4_filters(_docs(spark, texts), min_long_lines=1,
                            min_line_words=5).collect()
    }
    assert (got[0].keep, got[0].n_lines, got[0].n_long_lines) == (1, 1, 1)
    assert (got[1].f_lorem, got[1].keep) == (0, 0)
    assert (got[2].f_brace, got[2].keep, got[2].n_long_lines) == (0, 0, 2)
    assert (got[3].f_policy, got[3].keep) == (0, 0)
    # the f_minlines fail branch (constant-pass on the gate corpus)
    assert (got[4].f_minlines, got[4].keep) == (0, 0)
    assert (got[5].n_terminal_lines, got[5].n_lines, got[5].keep) == (1, 2, 1)


def test_role_pattern(spark):
    rows = [
        ("1", 0, "Ada Lovelace, founder of Acme Corp, said so ."),
        # two-word role; "of" inside the role must not confuse the parse
        ("1", 1, "Alan Turing, chief executive of Globex, resigned ."),
        # no trailing comma -> no match
        ("2", 0, "Grace Hopper, director of Initech said ."),
        # lowercase subject -> no match
        ("2", 1, "the intern, helper of Acme Corp, left ."),
    ]
    got = {
        (r.subj, r.role, r.obj): (r.n_sents, r.n_docs)
        for r in role_pattern_facts(_sents(spark, rows)).collect()
    }
    assert got == {
        ("ada lovelace", "founder", "acme corp"): (1, 1),
        ("alan turing", "chief executive", "globex"): (1, 1),
    }


def test_measurement_units_and_base(spark):
    rows = [
        ("1", 0, "Eiffel Tower measures 330 m tall ."),
        ("1", 1, "Blue Whale weighs 150000 kg ."),
        # "mg" must not be parsed as unit "m" + stray "g"
        ("2", 0, "Aspirin Dose is 500 mg ."),
        ("2", 1, "Interest Rate is 5 percent ."),
        # unit prefixing a longer word must NOT match ("g" in "goats")
        ("3", 0, "Farm Yard has 5 goats ."),
    ]
    got = {
        (r.url, r.sent_idx): (r.ent, r.verb, r.value_raw, r.unit,
                              r.unit_class, r.value_base)
        for r in measurement_facts(_sents(spark, rows)).collect()
    }
    assert got[("1", 0)] == ("eiffel tower", "measures", 330, "m",
                             "length", 330_000)
    assert got[("1", 1)] == ("blue whale", "weighs", 150000, "kg",
                             "mass", 150_000_000_000)
    assert got[("2", 0)] == ("aspirin dose", "is", 500, "mg", "mass", 500)
    assert got[("2", 1)] == ("interest rate", "is", 5, "percent",
                             "ratio", 50_000)
    assert ("3", 0) not in got
