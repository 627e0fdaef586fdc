"""pHash integer-DCT kernel, filter funnel, exact group quantiles, and
taxonomy rollup vs hand-computed / Python-replicated oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from unsupervised_ner_spark.ops.multimodal import (
    PHASH_DCT,
    perceptual_hash,
    synth_media,
)


def _py_phash(b: bytes) -> str:
    C = [PHASH_DCT[k * 8:(k + 1) * 8] for k in range(8)]
    n = len(b)
    pix = [[b[((x * 8 + y) * n) // 64] if n else 0 for y in range(8)]
           for x in range(8)]
    cp = [[sum(C[u][x] * pix[x][y] for x in range(8)) for y in range(8)]
          for u in range(8)]
    coef = [[sum(cp[u][y] * C[v][y] for y in range(8)) for v in range(8)]
            for u in range(8)]
    ac = sorted(coef[u][v] for u in range(8) for v in range(8) if u or v)
    med = ac[31]
    return "".join(
        "0" if (u == 0 and v == 0) else ("1" if coef[u][v] > med else "0")
        for u in range(8) for v in range(8)
    )


def test_phash_matches_python_replication(spark):
    texts = [
        (1, "The quick brown fox jumps over the lazy dog. " * 10),
        (2, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
        (3, "Mixed CONTENT with 123 numbers and, punctuation! " * 7),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r.doc_id: (r.phash_bits, r.n_ones)
        for r in perceptual_hash(synth_media(docs)).collect()
    }
    for doc_id, text in texts:
        bits = _py_phash(text.encode("utf-8"))
        assert got[doc_id] == (bits, bits.count("1")), doc_id
        assert bits[0] == "0"  # DC pinned
    # distinct coefficients -> exactly 31 bits above the median element
    assert got[1][1] <= 31 and got[3][1] <= 31


def test_phash_median_split_balanced(spark):
    # strict > at sorted index 31 bounds ones in [0, 31]; a varied payload
    # with distinct AC coefficients hits exactly 31
    docs = spark.createDataFrame(
        [(7, "".join(chr(97 + (i * 13) % 26) for i in range(400)))],
        "doc_id long, text string",
    )
    row = perceptual_hash(synth_media(docs)).collect()[0]
    assert 0 <= row.n_ones <= 31


def test_filter_funnel_attribution(spark):
    from unsupervised_ner_spark.ops.curation import filter_funnel

    mk = {
        # killed by too_short (first rule wins even though also low_stopword)
        1: "word " * 10,
        # 60 tokens, no stopwords -> low_stopword
        2: "zebra " * 60,
        # survivor: enough tokens, stopwords, diversity (3 stopwords +
        # 2 unique words per 5-token group -> 40% stopwords, >40% distinct)
        3: " ".join(f"the word{i} is of kind{i}" for i in range(40)),
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in mk.items()], "doc_id long, text string"
    )
    rows = {r.rule: (r.stage, r.n_killed, r.n_remaining)
            for r in filter_funnel(docs).collect()}
    assert rows["too_short"] == (0, 1, 2)
    assert rows["low_stopword"] == (1, 1, 1)
    assert rows["survivors"] == (5, 0, 1)
    assert set(rows) == {"too_short", "low_stopword", "survivors"}


def test_rel_quantiles_hand_case(spark):
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    got = {r.l_returnflag: (r.n, r.q25, r.q50, r.q75)
           for r in E.q_rel_quantiles(spark, sf).collect()}
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
    ).collect()
    by = {}
    for r in li:
        by.setdefault(r.l_returnflag, []).append(r.qty)
    for flag, vals in by.items():
        vals.sort()
        n = len(vals)

        def q(p):
            return vals[(n * p + 99) // 100 - 1]

        assert got[flag] == (n, q(25), q(50), q(75)), flag


def test_taxonomy_rollup_chain(spark):
    from unsupervised_ner_spark.pipeline.taxonomy import taxonomy_closure

    pairs = [("a", "b"), ("b", "c"), ("c", "d")]
    edges = spark.createDataFrame(
        [(x, y, 1, 1, "isa") for x, y in pairs],
        "hypo string, hyper string, n_sents long, n_docs long, pattern string",
    )
    clo = taxonomy_closure(edges, max_hops=8)
    roll = {
        r.hyper: (r.n_descendants, r.n_children, r.min_hops, r.max_hops)
        for r in clo.groupBy("hyper").agg(
            F.countDistinct("hypo").cast("long").alias("n_descendants"),
            F.sum(F.when(F.col("hops") == 1, 1).otherwise(0))
            .cast("long").alias("n_children"),
            F.min("hops").cast("long").alias("min_hops"),
            F.max("hops").cast("long").alias("max_hops"),
        ).collect()
    }
    assert roll == {
        "b": (1, 1, 1, 1),
        "c": (2, 1, 1, 2),
        "d": (3, 1, 1, 3),
    }
