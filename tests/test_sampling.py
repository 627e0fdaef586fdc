"""Deterministic sampling operators (ops/sampling.py): reproducibility,
balance exactness, and the hex-prefix bucket math."""

import pytest
from pyspark.sql import functions as F

from unsupervised_ner_spark.ops import sampling


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(f"doc{i:04d}", ["en", "de", "es"][i % 3]) for i in range(300)]
    # unequal strata: drop some 'es' docs so min stratum is well-defined
    rows = [r for r in rows if not (r[1] == "es" and int(r[0][3:]) > 200)]
    return spark.createDataFrame(rows, "doc_id string, lang string").cache()


def test_hash_sample_deterministic_and_sized(docs):
    a = {r.doc_id for r in sampling.hash_sample(docs, 1024).collect()}
    b = {r.doc_id for r in sampling.hash_sample(docs, 1024).collect()}
    assert a == b and a, "same input must select the same rows"
    # ~25% expected; loose bounds on 267 docs
    assert 0.10 < len(a) / docs.count() < 0.45
    # monotone: a larger keep set contains the smaller one
    bigger = {r.doc_id for r in sampling.hash_sample(docs, 2048).collect()}
    assert a <= bigger
    assert sampling.hash_sample(docs, 0).count() == 0
    assert sampling.hash_sample(docs, sampling.HASH_BUCKETS).count() == docs.count()
    with pytest.raises(ValueError):
        sampling.hash_sample(docs, sampling.HASH_BUCKETS + 1)


def test_balanced_sample_exact_counts(docs):
    out = sampling.balanced_sample(docs).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r.rank)
    true_min = min(r["count"] for r in docs.groupBy("lang").count().collect())
    assert set(by_lang) == {"en", "de", "es"}
    for lang, ranks in by_lang.items():
        assert len(ranks) == true_min, lang
        assert sorted(ranks) == list(range(1, true_min + 1)), lang
    # deterministic selection: md5 order, so re-running picks the same docs
    again = {(r.doc_id, r.lang, r.rank) for r in sampling.balanced_sample(docs).collect()}
    assert again == {(r.doc_id, r.lang, r.rank) for r in out}
