"""Document-level co-occurrence, vocab-coverage arithmetic, and
anchor-alias linking."""

from pyspark.sql import functions as F

from unsupervised_ner_spark.ops.textstats import vocab_coverage
from unsupervised_ner_spark.pipeline import er


def test_doc_cooccurrence_counts_docs_not_sentences(spark):
    rows = [
        # doc 1: A and B in different sentences -> still one doc edge
        ("1", 0, 0, "Apple", "ORG"),
        ("1", 1, 0, "Berlin", "LOCATION"),
        ("1", 2, 0, "apple!", "ORG"),       # same normalized entity, ignored dup
        # doc 2: A and B again
        ("2", 0, 0, "Apple", "ORG"),
        ("2", 0, 1, "Berlin", "LOCATION"),
        # doc 3: only A -> no pair
        ("3", 0, 0, "Apple", "ORG"),
    ]
    typed = spark.createDataFrame(
        rows,
        "url string, sent_idx long, mention_idx long, surface string, pred_group string",
    )
    out = er.doc_cooccurrence_edges(typed).collect()
    assert len(out) == 1
    e = out[0]
    assert (e.ent_a, e.ent_b) == ("apple", "berlin")  # lexicographic key order
    assert e.n_docs == 2
    # sentence-level operator would see only doc 2's pair
    sent = er.cooccurrence_edges(typed).collect()
    assert len(sent) == 1 and sent[0].n_sents == 1


def test_vocab_coverage_exact_fractions(spark):
    # corpus: 'a' x6, 'b' x3, 'c' x1 -> total 10
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a a a b b c")], "doc_id long, text string"
    )
    out = {r.k: r for r in vocab_coverage(docs, ks=(1, 2, 3, 99)).collect()}
    assert out[1].covered_tokens == 6 and out[1].coverage_ppm == 600_000
    assert out[2].covered_tokens == 9 and out[2].coverage_ppm == 900_000
    assert out[3].covered_tokens == 10 and out[3].coverage_ppm == 1_000_000
    assert out[99].covered_tokens == 10  # k beyond vocab: full coverage
    assert all(r.n_types_total == 3 and r.total_tokens == 10 for r in out.values())


def test_anchor_entity_aliases_normalized_join(spark):
    nodes = spark.createDataFrame(
        [("new york", "LOCATION", "n1", 9, "New York")],
        "norm_surface string, etype string, node_id string, n_mentions long, canonical_surface string",
    )
    ast = spark.createDataFrame(
        [
            ("https://t/1", "New  York!", 4, 2),   # normalizes onto the node
            ("https://t/2", "click here", 9, 9),   # no entity match
            ("https://t/3", "!!!", 1, 1),          # normalizes to empty: dropped
        ],
        "link_url string, anchor_norm string, n_anchors long, n_pages long",
    )
    out = er.anchor_entity_aliases(ast, nodes).collect()
    assert len(out) == 1
    r = out[0]
    assert r.node_id == "n1" and r.link_url == "https://t/1"
    assert r.n_anchors == 4 and r.n_pages == 2
