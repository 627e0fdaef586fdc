"""Inter-tagger agreement (ops/kgtrain.tagger_agreement), type-prior
disambiguation (pipeline/er.type_prior_resolution), and URL template
mining (webtext.url_templates)."""

from pyspark.sql import functions as F

from unsupervised_ner_spark.ops import webtext
from unsupervised_ner_spark.ops.kgtrain import tagger_agreement
from unsupervised_ner_spark.pipeline.er import type_prior_resolution


def _tags(spark, triples):
    return spark.createDataFrame(
        [("u1", 0, i, t) for i, t in enumerate(triples)],
        "url string, sent_idx long, token_idx long, tag string",
    )


def test_tagger_agreement_confusion_and_kappa(spark):
    a = _tags(spark, ["O", "O", "B_PERSON", "I_PERSON", "O", "B_ORG"])
    b = _tags(spark, ["O", "B_ORG", "B_PERSON", "I_PERSON", "O", "O"])
    rows = {(r.tag_a, r.tag_b): r for r in tagger_agreement(a, b).collect()}
    assert rows[("O", "O")].n_pair == 2
    assert rows[("O", "B_ORG")].n_pair == 1
    assert rows[("B_ORG", "O")].n_pair == 1
    assert rows[("B_PERSON", "B_PERSON")].n_pair == 1
    # marginals: model A gave 'O' 3 times; model B gave 'O' 3 times
    assert rows[("O", "O")].n_a == 3 and rows[("O", "O")].n_b == 3
    assert all(r.n_total == 6 for r in rows.values())
    # kappa recoverable from the emitted integers alone
    n = 6
    po = sum(r.n_pair for (ta, tb), r in rows.items() if ta == tb) / n
    # pe from one row per distinct tag_a (n_a) x matching n_b
    n_a = {ta: r.n_a for (ta, _), r in rows.items()}
    n_b = {tb: r.n_b for (_, tb), r in rows.items()}
    pe = sum(n_a.get(t, 0) * n_b.get(t, 0) for t in set(n_a) | set(n_b)) / n**2
    kappa = (po - pe) / (1 - pe)
    assert 0.0 < kappa < 1.0  # agree more than chance, less than always


def test_tagger_agreement_only_shared_tokens(spark):
    """Tokens present in only one table are excluded (inner join), so a
    length-divergent tokenization can't smuggle phantom disagreements."""
    a = _tags(spark, ["O", "B_ORG", "O"])
    b = _tags(spark, ["O", "B_ORG"])  # one token shorter
    out = tagger_agreement(a, b).collect()
    assert sum(r.n_pair for r in out) / len(out) and all(r.n_total == 2 for r in out)


def test_type_prior_resolution_majority_and_ties(spark):
    rows = (
        [("u", 0, "Paris", "LOCATION")] * 3
        + [("u", 1, "Paris!", "PERSON")] * 1      # normalizes to 'paris'
        + [("u", 2, "Tie", "ORG")] * 2
        + [("u", 3, "tie", "PERSON")] * 2         # tie -> PERSON < ORG? no: count eq, lex asc
        + [("u", 4, "Mono", "ORG")] * 5           # single-typed: excluded
        + [("u", 5, "Junk", "OTHER")] * 9         # OTHER never counts
    )
    df = spark.createDataFrame(
        rows, "url string, sent_idx long, surface string, pred_group string"
    )
    out = {r.norm_surface: r for r in type_prior_resolution(df).collect()}
    assert set(out) == {"paris", "tie"}
    p = out["paris"]
    assert (p.win_type, p.n_win, p.n_total, p.n_types) == ("LOCATION", 3, 4, 2)
    t = out["tie"]
    assert (t.win_type, t.n_win) == ("ORG", 2)  # equal counts -> lexicographic


def test_url_templates_collapse_and_counts(spark):
    urls = [
        (1, "https://a.example.com/cat1/page-1.html"),
        (2, "https://a.example.com/cat2/page-22.html"),
        (3, "https://b.example.com/cat9/page-333.html"),
        (4, "https://a.example.com/about"),
        (5, "https://a.example.com/cat1/page-1.html"),  # dup url
    ]
    parsed = webtext.parse_urls(
        spark.createDataFrame(urls, "doc_id long, url string")
    )
    out = {
        (r.reg_domain, r.path_template): r
        for r in webtext.url_templates(parsed).collect()
    }
    tpl = out[("example.com", "/catN/page-N.html")]
    assert tpl.n_docs == 4 and tpl.n_hosts == 2 and tpl.n_urls == 3
    assert tpl.sample_doc_id == 1
    assert out[("example.com", "/about")].n_docs == 1
