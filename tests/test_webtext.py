"""Unit tests for ops/webtext.py — web-ingestion operators."""

import pytest

from unsupervised_ner_spark.ops import webtext


def _rows(df):
    return [r.asDict() for r in df.collect()]


def test_parse_urls_branches(spark):
    df = spark.createDataFrame(
        [
            (1, "HTTPS://WWW.Example.CO.UK:443/a/b/c.html?q=1#frag"),
            (2, "http://news.example.com:8080/x"),
            (3, "https://example.org"),
            (4, "http://localhost:80/"),
        ],
        ["doc_id", "url"],
    )
    out = {r["doc_id"]: r for r in _rows(webtext.parse_urls(df))}

    r1 = out[1]
    assert r1["scheme"] == "https"
    assert r1["host"] == "www.example.co.uk"
    assert r1["port"] == 443
    # default https port stripped; query+fragment stripped; host lowercased
    assert r1["url_norm"] == "https://www.example.co.uk/a/b/c.html"
    # public-suffix-lite: co.uk takes three labels (www skipped naturally)
    assert r1["reg_domain"] == "example.co.uk"
    assert r1["path_depth"] == 3

    r2 = out[2]
    assert r2["port"] == 8080
    assert r2["url_norm"] == "http://news.example.com:8080/x"
    assert r2["reg_domain"] == "example.com"

    r3 = out[3]
    assert r3["port"] is None
    assert r3["path"] == ""
    assert r3["path_depth"] == 0
    assert r3["url_norm"] == "https://example.org/"

    r4 = out[4]
    # default http port stripped; single-label host is its own reg domain
    assert r4["url_norm"] == "http://localhost/"
    assert r4["reg_domain"] == "localhost"


def test_domain_stats_blocklist(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.example.com/x"),
            (2, "https://b.example.com/y"),
            (3, "https://a.example.com/x?utm=1"),
            (4, "https://bad.net/z"),
        ],
        ["doc_id", "url"],
    )
    out = {
        r["reg_domain"]: r
        for r in _rows(
            webtext.domain_stats(webtext.parse_urls(df), blocklist=("bad.net",))
        )
    }
    ex = out["example.com"]
    assert ex["n_docs"] == 3 and ex["n_hosts"] == 2
    # doc 3's tracking query collapses into doc 1's normalized URL
    assert ex["n_urls"] == 2 and not ex["blocked"]
    assert out["bad.net"]["blocked"]


@pytest.mark.parametrize(
    "line,kept",
    [
        ("This sentence has plenty of words and ends well.", True),
        ('He said "stop right there" and they did!"', True),
        ("Too short.", False),  # < 4 words
        ("this line has many words but no terminal punctuation", False),
        ("Please enable JavaScript to view these comments now.", False),
        ("We use cookie banners on every page here.", False),
        ("A config line { nested: true } with punctuation.", False),
        ("lorem ipsum dolor sit amet consectetur adipiscing elit.", False),
    ],
)
def test_filter_lines_rules(spark, line, kept):
    df = spark.createDataFrame([(1, line)], ["doc_id", "text"])
    row = _rows(webtext.filter_lines(df))[0]
    assert row["n_lines"] == 1
    assert row["n_kept"] == (1 if kept else 0)
    assert row["clean_text"] == (line if kept else "")


def test_filter_lines_multiline_join(spark):
    text = "Good line with several words here.\nbad\nAnother good line stays in place."
    row = _rows(
        webtext.filter_lines(
            spark.createDataFrame([(1, text)], ["doc_id", "text"])
        )
    )[0]
    assert row["n_lines"] == 3 and row["n_kept"] == 2
    assert (
        row["clean_text"]
        == "Good line with several words here.\nAnother good line stays in place."
    )


def test_strip_markup(spark):
    html = (
        '<html><head><script>if(1<2){alert("x")}</script>'
        "<style>p{color:red}</style></head>"
        '<body><h1>Title</h1><p class="a">Hello &amp; &lt;world&gt;</p><br/></body></html>'
    )
    row = _rows(
        webtext.strip_markup(spark.createDataFrame([(1, html)], ["doc_id", "text"]))
    )[0]
    # script/style CONTENT dropped, entities unescaped, whitespace collapsed
    assert row["clean_text"] == "Title Hello & <world>"
    # tags after script/style removal: html, head, /head, body, h1, /h1,
    # p, /p, br/, /body, /html = 11
    assert row["n_tags"] == 11


def test_strip_markup_amp_last(spark):
    # '&amp;lt;' must become '&lt;' (literal), NOT '<' — unescape order
    row = _rows(
        webtext.strip_markup(
            spark.createDataFrame([(1, "a &amp;lt; b")], ["doc_id", "text"])
        )
    )[0]
    assert row["clean_text"] == "a &lt; b"


def test_encoding_quality_signals(spark):
    df = spark.createDataFrame(
        [
            (1, "perfectly clean text"),
            (2, "bad � byte"),
            (3, "bell \x07 char and tab\tis fine\nso is newline"),
            (4, "mojibake cafÃ© and naÃ¯ve"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in _rows(webtext.encoding_quality(df))}
    assert not out[1]["suspect"]
    assert out[2]["n_repl_chars"] == 1 and out[2]["suspect"]
    assert out[3]["n_ctrl_chars"] == 1 and out[3]["suspect"]
    assert out[4]["n_mojibake"] == 2 and out[4]["suspect"]


def test_extract_links_resolution(spark):
    html = (
        '<p><a href="https://other.net/abs">x</a>'
        '<a class="n" href="/root.html#sec">y</a>'
        '<a href="rel/page.html">z</a>'
        '<a href="//cdn.net/l.js">c</a>'
        '<a href="#frag">f</a>'
        '<a href="mailto:a@b.c">m</a>'
        '<a href="javascript:void(0)">j</a></p>'
    )
    df = spark.createDataFrame(
        [("https://www.ex.com/dir/cur.html", html)], ["url", "html_text"]
    )
    out = {r["link_raw"]: r for r in _rows(webtext.extract_links(df))}
    # fragment-only / mailto / javascript dropped
    assert set(out) == {
        "https://other.net/abs", "/root.html#sec", "rel/page.html", "//cdn.net/l.js"
    }
    assert out["https://other.net/abs"]["link_url"] == "https://other.net/abs"
    assert out["https://other.net/abs"]["link_host"] == "other.net"
    # fragment stripped, root-relative resolved against the host
    assert out["/root.html#sec"]["link_url"] == "https://www.ex.com/root.html"
    # relative resolved against the parent directory
    assert out["rel/page.html"]["link_url"] == "https://www.ex.com/dir/rel/page.html"
    # protocol-relative inherits the page scheme
    assert out["//cdn.net/l.js"]["link_url"] == "https://cdn.net/l.js"


def test_host_link_graph(spark):
    df = spark.createDataFrame(
        [
            ("https://a.com/1", '<a href="/x">i</a><a href="https://b.com/y">e</a>'),
            ("https://a.com/2", '<a href="https://b.com/z">e</a>'),
        ],
        ["url", "html_text"],
    )
    out = {
        (r["src_host"], r["dst_host"]): r
        for r in _rows(webtext.host_link_graph(webtext.extract_links(df)))
    }
    ab = out[("a.com", "b.com")]
    assert ab["n_links"] == 2 and ab["n_pages"] == 2 and not ab["internal"]
    aa = out[("a.com", "a.com")]
    assert aa["n_links"] == 1 and aa["n_pages"] == 1 and aa["internal"]


def test_extract_anchors_and_stats(spark):
    html = (
        '<head><link rel="canonical" href="/canon.html"></head>'
        '<p><a href="/x"><b>Bold</b>  Name</a>'
        '<a href="https://o.net/y">plain</a>'
        '<a href="img.png"><img src="i"/></a></p>'
    )
    df = spark.createDataFrame(
        [("https://ex.com/d/p.html", html)], ["url", "html_text"]
    )
    out = {r["link_raw"]: r for r in _rows(webtext.extract_anchors(df))}
    # canonical <link> must NOT match the <a ...> pattern
    assert set(out) == {"/x", "https://o.net/y", "img.png"}
    # inner markup tag-stripped + whitespace-collapsed + lowercased
    assert out["/x"]["anchor_norm"] == "bold name"
    assert out["img.png"]["anchor_norm"] == ""  # image-only anchor

    stats = {
        (r["link_url"], r["anchor_norm"])
        for r in _rows(webtext.anchor_text_stats(webtext.extract_anchors(df)))
    }
    # empty anchors dropped from the alias table
    assert stats == {
        ("https://ex.com/x", "bold name"),
        ("https://o.net/y", "plain"),
    }


def test_canonical_urls(spark):
    df = spark.createDataFrame(
        [
            ("https://ex.com/a.html",
             '<link rel="canonical" href="https://ex.com/b.html">'),
            ("https://ex.com/self.html",
             '<link rel="canonical" href="/self.html#frag">'),
            ("https://ex.com/none.html", "<p>no canonical here</p>"),
        ],
        ["url", "html_text"],
    )
    out = {r["url"]: r for r in _rows(webtext.canonical_urls(df))}
    a = out["https://ex.com/a.html"]
    assert a["canonical_url"] == "https://ex.com/b.html" and not a["is_self"]
    # root-relative canonical resolves + fragment strips -> equals self
    s = out["https://ex.com/self.html"]
    assert s["canonical_url"] == "https://ex.com/self.html" and s["is_self"]
    # absent canonical falls back to the page's own normalized URL
    n = out["https://ex.com/none.html"]
    assert n["canonical_url"] == "https://ex.com/none.html" and n["is_self"]


def test_host_hits_hand_graph(spark):
    # a -> c, b -> c, c -> d  (hand-unrolled: 2 iterations, scale 1e6)
    g = spark.createDataFrame(
        [
            ("a", "c", 1, 1, False),
            ("b", "c", 1, 1, False),
            ("c", "d", 1, 1, False),
            ("c", "c", 9, 9, True),  # internal edge must be excluded
        ],
        ["src_host", "dst_host", "n_links", "n_pages", "internal"],
    )
    out = {r["host"]: r for r in _rows(webtext.host_hits(g))}
    S = 1_000_000
    assert out["a"]["hub_scaled"] == S and out["a"]["auth_scaled"] == 0
    assert out["b"]["hub_scaled"] == S and out["b"]["auth_scaled"] == 0
    # c: top authority; its hub decays with d's authority (S/2 then S/4)
    assert out["c"]["auth_scaled"] == S and out["c"]["hub_scaled"] == S // 4
    assert out["d"]["auth_scaled"] == S // 4 and out["d"]["hub_scaled"] == 0


def test_canonical_dedup_groups(spark):
    df = spark.createDataFrame(
        [
            ("https://ex.com/p1", '<link rel="canonical" href="https://ex.com/c">'),
            ("https://ex.com/p2", '<link rel="canonical" href="https://ex.com/c">'),
            ("https://ex.com/c", '<link rel="canonical" href="https://ex.com/c">'),
            ("https://ex.com/solo", "<p>none</p>"),
        ],
        ["url", "html_text"],
    )
    out = {
        r["canonical_url"]: r
        for r in _rows(webtext.canonical_dedup_groups(webtext.canonical_urls(df)))
    }
    grp = out["https://ex.com/c"]
    assert grp["n_pages"] == 3 and grp["n_self"] == 1
    assert grp["representative"] == "https://ex.com/c"
    solo = out["https://ex.com/solo"]
    assert solo["n_pages"] == 1 and solo["n_self"] == 1
