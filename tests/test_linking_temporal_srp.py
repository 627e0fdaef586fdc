"""Unit tests for the round-5 additions: entity linking (er.link_entities_to_kb),
temporal fact table (triples.triples_temporal), SRP-LSH ANN (simsearch.srp_lsh_topk)."""

import hashlib

from pyspark.sql import functions as F

from unsupervised_ner_spark.ops import simsearch
from unsupervised_ner_spark.pipeline import er
from unsupervised_ner_spark.pipeline.triples import triples_temporal


def _nodes(spark, rows):
    return spark.createDataFrame(
        [
            (hashlib.md5(f"{ns}|{et}".encode()).hexdigest(), ns, et, n)
            for ns, et, n in rows
        ],
        "node_id string, norm_surface string, etype string, n_mentions long",
    )


def _kb(spark, rows):
    return spark.createDataFrame(
        [(t, list(ls), [1] * len(ls)) for t, ls in rows],
        "term string, labels array<string>, counts array<int>",
    )


class TestEntityLinking:
    def test_exact_beats_fuzzy_and_head(self, spark):
        nodes = _nodes(spark, [("imatinib", "DRUG", 3)])
        kb = _kb(spark, [("imatinib", ["DRUG"]), ("imatinia", ["GENE"])])
        out = er.link_entities_to_kb(nodes, kb).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.kb_term, r.kb_label, r.lev, r.chan) == ("imatinib", "DRUG", 0, 0)

    def test_head_token_fallback_for_multiword(self, spark):
        nodes = _nodes(spark, [("lou gehrig", "PERSON", 2)])
        kb = _kb(spark, [("gehrig", ["PERSON"])])
        r = er.link_entities_to_kb(nodes, kb).collect()[0]
        assert (r.kb_term, r.chan, r.lev) == ("gehrig", 1, 0)

    def test_full_surface_channel_wins_over_head(self, spark):
        # both channels match something: chan 0 must win even at higher lev
        nodes = _nodes(spark, [("new yorc", "LOCATION", 1)])
        kb = _kb(spark, [("new york", ["LOCATION"]), ("yorc", ["THING"])])
        r = er.link_entities_to_kb(nodes, kb).collect()[0]
        assert (r.kb_term, r.chan, r.lev) == ("new york", 0, 1)

    def test_lev_bound_and_prefix_block(self, spark):
        nodes = _nodes(spark, [("abcdefgh", "THING", 1), ("xavier", "PERSON", 1)])
        # lev 3 > 2 -> no link; prefix mismatch (za != xa) blocks despite lev 1
        kb = _kb(spark, [("abxxxfgh", ["THING"]), ("zavier", ["PERSON"])])
        assert er.link_entities_to_kb(nodes, kb).count() == 0

    def test_tie_breaks_on_term_then_label(self, spark):
        nodes = _nodes(spark, [("aspirim", "DRUG", 1)])
        kb = _kb(spark, [("aspirin", ["DRUG"]), ("aspiril", ["GENE"])])
        r = er.link_entities_to_kb(nodes, kb).collect()[0]
        assert r.kb_term == "aspiril"  # lev 1 both; 'aspiril' < 'aspirin'

    def test_kb_norm_dedup_is_argmin(self, spark):
        # 'x-ray' and 'xray' normalize identically; min(term) keeps 'x-ray'
        nodes = _nodes(spark, [("xray", "THING", 1)])
        kb = _kb(spark, [("xray", ["A"]), ("x-ray", ["B"])])
        r = er.link_entities_to_kb(nodes, kb).collect()[0]
        assert (r.kb_term, r.kb_label) == ("x-ray", "B")


class TestTriplesTemporal:
    def test_two_level_counts(self, spark):
        day = 86400
        rows = [
            # same triple: url a twice (day 0), url b once (day 0), url c (day 2)
            ("a", "s", "T", "p", "o", "T", 10),
            ("a", "s", "T", "p", "o", "T", 10),
            ("b", "s", "T", "p", "o", "T", 50),
            ("c", "s", "T", "p", "o", "T", 2 * day + 5),
            # different triple
            ("a", "s2", "T", "p", "o", "T", 7),
        ]
        df = spark.createDataFrame(
            rows,
            "url string, subj string, subj_type string, pred_norm string,"
            "obj string, obj_type string, obs_ts long",
        )
        out = {
            r.subj: r
            for r in triples_temporal(df).collect()
        }
        r = out["s"]
        assert (r.n_obs, r.n_pages, r.n_days) == (4, 3, 2)
        assert (r.first_seen, r.last_seen) == (10, 2 * day + 5)
        assert (out["s2"].n_obs, out["s2"].n_pages, out["s2"].n_days) == (1, 1, 1)


class TestSrpLsh:
    def test_signs_deterministic_rademacher(self):
        s1 = simsearch.srp_signs(8, 64)
        s2 = simsearch.srp_signs(8, 64)
        assert s1 == s2
        assert {v for row in s1 for v in row} == {1.0, -1.0}

    def test_bucket_range_and_duplicate_found_first(self, spark):
        import random

        rng = random.Random(7)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(40)]
        rows.append((40, [x * 2.0 for x in rows[0][1]]))  # scaled copy of vec 0
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        hashed = df.select(
            simsearch.srp_bucket_col(
                F.col("embedding").cast("array<double>"), 8, 64
            ).alias("b")
        )
        assert hashed.filter((F.col("b") < 0) | (F.col("b") > 255)).count() == 0
        out = simsearch.srp_lsh_topk(df, n_queries=1, k=3)
        top = {r.rank: r.neighbor_id for r in out.collect()}
        # the scaled copy shares vec 0's bucket exactly (same signs) -> rank 1
        assert top[1] == 40

    def test_multiprobe_superset_of_single_probe(self, spark):
        import random

        rng = random.Random(11)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(60)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        single = simsearch.srp_lsh_topk(df, n_queries=3, k=50, multiprobe=False)
        multi = simsearch.srp_lsh_topk(df, n_queries=3, k=50, multiprobe=True)
        s = {(r.query_id, r.neighbor_id) for r in single.collect()}
        m = {(r.query_id, r.neighbor_id) for r in multi.collect()}
        assert s <= m

    def test_wrong_dim_fails_loudly(self, spark):
        import pytest

        df = spark.createDataFrame(
            [(0, [1.0] * 32)], "vec_id long, embedding array<float>"
        )
        with pytest.raises(Exception, match="expected dim"):
            simsearch.srp_lsh_topk(df, n_queries=1).collect()


def test_ann_recall_dashboard(spark):
    import random

    from unsupervised_ner_spark.ops.simsearch import ann_recall

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(64)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r.method, r.query_id): (r.n_hit, r.k, r.recall_scaled)
        for r in ann_recall(emb, n_queries=3, k=4).collect()
    }
    # every (method, query) present, hits within [0, k], recall consistent
    assert set(got) == {(m, q) for m in ("ivf1", "ivf2") for q in range(3)}
    for (m, q), (n, k, rs) in got.items():
        assert 0 <= n <= k == 4
        assert rs == 1_000_000 * n // k
    # multi-probe can only add probed cells: recall is monotone per query
    for q in range(3):
        assert got[("ivf2", q)][0] >= got[("ivf1", q)][0], q
