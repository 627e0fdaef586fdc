"""Unit tests for ER pair features (pipeline/er.py pair_features),
landmark shortest-path counts (er.landmark_path_counts) and sitemap
build/parse (ops/webtext.py) — hand cases with exact expected integers;
the corpus-scale parity gates are er_pair_features / kg_path_counts /
txt_sitemaps."""

from __future__ import annotations

from unsupervised_ner_spark.ops import webtext
from unsupervised_ner_spark.pipeline import er


def _surfs(spark, names):
    return spark.createDataFrame([(n,) for n in names], "norm_surface string")


def test_pair_features_exact_vector(spark):
    # smith/smyth share pkey S530: lev 1, 3-gram shingles of ^smith$ =
    # {^sm, smi, mit, ith, th$} vs ^smyth$ = {^sm, smy, myt, yth, th$}
    # -> inter 2, union 8, ppm = 250000
    rows = er.pair_features(_surfs(spark, ["smith", "smyth"])).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.surf_a, r.surf_b) == ("smith", "smyth")
    assert (r.lev, r.len_a, r.len_b) == (1, 5, 5)
    assert (r.n_tok_a, r.n_tok_b, r.tok_overlap) == (1, 1, 0)
    assert (r.sh_inter, r.sh_union, r.sh_jaccard_ppm) == (2, 8, 250000)


def test_pair_features_token_overlap(spark):
    # multi-token surfaces sharing a token and the phonetic key of the
    # full string: "smith co" vs "smyth co" -> token overlap 1 of 2
    rows = er.pair_features(_surfs(spark, ["smith co", "smyth co"])).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_tok_a, r.n_tok_b, r.tok_overlap) == (2, 2, 1)
    assert r.lev == 1


def test_pair_features_no_threshold(spark):
    # unlike phonetic_pairs, distant in-bucket pairs are KEPT (the
    # classifier decides): smith/sandy share S530? smith->S530,
    # sandy->S530 (s,n->5? no) — use surfaces known to share a key:
    # 'robert'/'rupert' (R163) at lev 2 and 'robert'/'rabbit' (R163
    # vs R130?) — assert simply that no lev filter was applied by
    # checking a lev>2 pair survives when keys collide: 'aaa'/'aooo'
    # have pkey A000 both (vowels deleted) and lev 3
    rows = er.pair_features(_surfs(spark, ["aaa", "aooo"])).collect()
    assert len(rows) == 1 and rows[0].lev == 3


def _edges(spark, pairs):
    rows = [(a, "T", b, "T", 1, 1) for a, b in pairs]
    return spark.createDataFrame(
        rows,
        "ent_a string, type_a string, ent_b string, type_b string, "
        "n_sents long, n_docs long",
    )


def test_landmark_path_counts_diamond(spark):
    # double diamond: m (degree 4) is the top-degree seed; h and q each
    # sit behind TWO parallel 2-paths from m -> dist 2 with sigma 2;
    # the four intermediates are dist 1 sigma 1
    pairs = [("h", "x"), ("h", "y"), ("x", "m"), ("y", "m"),
             ("m", "u"), ("m", "v"), ("u", "q"), ("v", "q")]
    out = {
        (r.seed_rank, r.ent): (r.dist, r.sigma)
        for r in er.landmark_path_counts(
            _edges(spark, pairs), rounds=3, n_seeds=1
        ).collect()
    }
    assert out[(1, "m")] == (0, 1)
    for mid in ("x", "y", "u", "v"):
        assert out[(1, mid)] == (1, 1)
    assert out[(1, "h")] == (2, 2)
    assert out[(1, "q")] == (2, 2)
    assert len(out) == 7


def test_landmark_path_counts_depth_cutoff(spark):
    # a 5-node path from the seeded hub: nodes past ``rounds`` hops are
    # absent (the bounded-horizon contract); hub fixed by 3 extra leaves
    pairs = [("h", "l1"), ("h", "l2"), ("h", "l3"),
             ("h", "p1"), ("p1", "p2"), ("p2", "p3"), ("p3", "p4")]
    out = {
        r.ent: (r.dist, r.sigma)
        for r in er.landmark_path_counts(
            _edges(spark, pairs), rounds=3, n_seeds=1
        ).collect()
    }
    assert out["p3"] == (3, 1)
    assert "p4" not in out


def test_landmark_path_counts_shortest_only(spark):
    # a direct edge PLUS a 2-hop detour: only the shortest path counts
    # (sigma(b)=1 at dist 1, never 2) — plus a leaf to fix the seed
    pairs = [("a", "b"), ("a", "c"), ("c", "b"), ("a", "l1"), ("a", "l2")]
    out = {
        r.ent: (r.dist, r.sigma)
        for r in er.landmark_path_counts(
            _edges(spark, pairs), rounds=3, n_seeds=1
        ).collect()
    }
    assert out["b"] == (1, 1)
    assert out["c"] == (1, 1)


def _docs(spark, ids):
    return spark.createDataFrame([(i, f"t{i}") for i in ids],
                                 "doc_id long, text string")


def test_sitemap_roundtrip(spark):
    out = webtext.parse_sitemaps(webtext.build_sitemaps(_docs(spark, [0, 5, 17])))
    rows = {(r.host, r.entry_idx): r for r in out.collect()}
    # 0 and 17 share host site-0; entries ordered by doc_id
    r0 = rows[("site-0.example.com", 0)]
    assert r0.loc == "https://site-0.example.com/page-0.html"
    assert r0.lastmod == "2024-01-01"
    assert r0.changefreq == "daily"
    assert r0.priority_pct == 0
    r17 = rows[("site-0.example.com", 1)]
    assert r17.loc.endswith("/page-17.html")
    assert r17.lastmod == "2024-06-18"
    assert r17.changefreq == "monthly"  # 17 % 3 = 2
    assert r17.priority_pct == 70
    r5 = rows[("site-5.example.com", 0)]
    assert (r5.changefreq, r5.priority_pct) == ("monthly", 50)
    assert len(rows) == 3
