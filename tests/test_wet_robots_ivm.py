"""WET record parsing (roundtrip exactness), robots longest-match
semantics, snapshot retention, audio windowing edges, and incremental
co-occurrence maintenance (merge == full recompute)."""

from pyspark.sql import functions as F

from unsupervised_ner_spark.ops import layout, multimodal, webtext
from unsupervised_ner_spark.pipeline import er


def test_wet_roundtrip_exact(spark):
    docs = spark.createDataFrame(
        [
            (0, "plain body."),
            (1, "body with\n\nblank line and WARC/1.0 look-alike inside"),
            (2, "unicode café — body"),
            (13, "second file."),
        ],
        "doc_id long, text string",
    )
    out = webtext.parse_wet_records(webtext.build_wet_files(docs, docs_per_file=10))
    rows = {int(r.uri.rsplit("/", 1)[1]): r for r in out.collect()}
    orig = {r.doc_id: r.text for r in docs.collect()}
    assert set(rows) == set(orig)
    for did, r in rows.items():
        assert r.body == orig[did], did  # Content-Length cut is exact
        assert r.content_length == len(orig[did])
    # record_idx is per-file and ordered by doc_id
    assert rows[0].file_id == 0 and rows[0].record_idx == 0
    assert rows[1].record_idx == 1 and rows[2].record_idx == 2
    assert rows[13].file_id == 1 and rows[13].record_idx == 0


def test_robots_longest_match_and_default(spark):
    parsed = spark.createDataFrame(
        [
            (1, "h7.example", "/cat3/page-1.html"),   # matches all 3 rules
            (2, "h7.example", "/cat3/other"),          # deny beats '/'
            (3, "h7.example", "/elsewhere"),           # only '/'
            (4, "h7.example", ""),                     # no match -> default
        ],
        "doc_id long, host string, path string",
    )
    # strlen('h7.example') = 10 -> 10 % 7 = 3 -> rules on /cat3/
    out = {r.doc_id: r for r in
           webtext.robots_allowed(parsed, webtext.robots_rules(parsed)).collect()}
    assert out[1].allowed and out[1].match_prefix == "/cat3/page-1"
    assert not out[2].allowed and out[2].match_prefix == "/cat3/"
    assert out[3].allowed and out[3].match_prefix == "/"
    assert out[4].allowed and out[4].match_prefix == ""


def test_robots_allow_wins_equal_length(spark):
    parsed = spark.createDataFrame(
        [(1, "h.example", "/x/page")], "doc_id long, host string, path string"
    )
    rules = spark.createDataFrame(
        [("h.example", "/x/", False), ("h.example", "/x/", True)],
        "host string, prefix string, allow boolean",
    )
    r = webtext.robots_allowed(parsed, rules).collect()[0]
    assert r.allowed  # RFC 9309: allow wins the tie


def test_snapshot_expiry_policy(spark):
    snaps = spark.createDataFrame(
        [(i, i // 10) for i in range(30)], "snap_id long, day long"
    )
    out = {r.snap_id: r for r in layout.snapshot_expiry(snaps, keep_last=5).collect()}
    assert all(out[i].keep_last for i in range(25, 30))
    assert not out[24].keep_last
    for first in (0, 10, 20):
        assert out[first].keep_daily and not out[first + 1].keep_daily
    # expire = neither rule; e.g. 11 is mid-day, not recent
    assert out[11].expire and not out[0].expire and not out[29].expire
    kept = [i for i in range(30) if not out[i].expire]
    assert kept == [0, 10, 20, 25, 26, 27, 28, 29]


def test_audio_windows_edges(spark):
    meta = spark.createDataFrame(
        [(1, 16000, 16000), (2, 15999, 16000), (3, 40000, 16000)],
        "doc_id long, n_samples long, sample_rate long",
    )
    out = multimodal.audio_windows(meta, win=16000, hop=8000).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc.get(1, [])) == 1          # exactly one full window
    assert 2 not in by_doc                       # too short: zero rows
    w3 = sorted(by_doc[3], key=lambda r: r.window_idx)
    assert [r.start_sample for r in w3] == [0, 8000, 16000, 24000]
    assert all(r.end_sample - r.start_sample == 16000 for r in w3)
    assert all(r.end_sample <= 40000 for r in w3)


def test_cooccurrence_incremental_equals_full(spark):
    rows = []
    for u in range(6):
        # two entities per sentence; url-disjoint batches by u % 2
        rows.append((str(u), 0, 0, f"Alice{u % 3}", "PERSON"))
        rows.append((str(u), 0, 1, "Paris", "LOCATION"))
    typed = spark.createDataFrame(
        rows, "url string, sent_idx long, mention_idx long, surface string, pred_group string"
    )
    full = {
        (r.ent_a, r.ent_b): (r.n_sents, r.n_docs)
        for r in er.cooccurrence_edges(typed).collect()
    }
    inc = {
        (r.ent_a, r.ent_b): (r.n_sents, r.n_docs)
        for r in er.cooccurrence_edges_incremental(
            typed.filter(F.col("url").cast("long") % 2 == 0),
            typed.filter(F.col("url").cast("long") % 2 == 1),
        ).collect()
    }
    assert inc == full and full  # additive merge is exact
