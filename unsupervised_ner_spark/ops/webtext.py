"""Web-ingestion operators: URL parsing/normalization, per-domain crawl
stats with blocklist screening, C4-style line filtering, naive HTML
stripping, and encoding-quality (mojibake) detection.

These are the bronze-layer operators a Common-Crawl-scale webtext
pipeline runs BEFORE the KG chain (the reference's corpus arrives as
pre-extracted one-sentence-per-line text — batched_main_NER.py:800-811 —
so these stand in front of its S1 scan at web scale). All pure Column
expressions: JVM regex inside whole-stage codegen, no Python, no
exchange except the final bounded domain aggregate. At 100 TB every one
of these is a map-only stage over the page scan.

Regex patterns are kept to the Java-regex/RE2 agreement subset
(character classes, alternation, bounded quantifiers, inline (?is)
flags, non-greedy — no backrefs/lookaround) and are IMPORTED by the
DuckDB oracle so the twins cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- URL grammar (RFC-3986-lite, agreement subset) -----------------------
SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
HOSTPORT_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
PORT_RE = r":([0-9]+)$"
PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)"

# public-suffix-LITE: second-level labels under which the registered
# domain takes three labels (co.uk, ac.jp, ...). A production deployment
# swaps in the full Mozilla public-suffix list as a broadcast dim; the
# heuristic keeps the operator dependency-free and is documented as such.
SECOND_LEVEL_TLDS = ("ac", "co", "com", "edu", "gov", "net", "org")

DEFAULT_PORTS = {"http": 80, "https": 443}

# --- C4-style line-filter lexicon (Raffel et al. 2020 §2.2 heuristics) ---
LINE_MIN_WORDS = 4
LINE_TERMINAL_RE = r'[.!?"]$'
LINE_BLOCKWORDS = ("javascript", "cookie", "lorem ipsum")

# --- HTML stripping -------------------------------------------------------
SCRIPT_RE = r"(?is)<script[^>]*>.*?</script>"
STYLE_RE = r"(?is)<style[^>]*>.*?</style>"
TAG_RE = r"(?s)<[^>]*>"
# unescape order matters: '&amp;' LAST (exact inverse of escape-'&'-first)
HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)

# --- encoding quality -----------------------------------------------------
CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"
# UTF-8-read-as-latin1 mojibake: 'Ã' followed by a continuation-byte
# glyph. Fixed literal class (not a range) so Java and RE2 agree byte-wise.
MOJIBAKE_RE = "Ã[©¯¨¤¶¼±³«»]"
REPLACEMENT_CHAR = "�"


def _n_matches(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0))).cast("long")


def parse_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Parse + normalize a URL column: lowercase scheme/host, split off
    the port, derive the registered domain (public-suffix-lite), count
    path segments, and build ``url_norm`` — scheme://host[:port]/path
    with the default port (80/443), query, and fragment stripped and an
    empty path canonicalized to '/'. The dedup/provenance join key for
    web corpora (two crawls of the same page differ only in tracking
    query params more often than in content).

    Narrow per-row expressions only — no exchange at any scale."""
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u, HOSTPORT_RE, 1))
    port_s = F.regexp_extract(hostport, PORT_RE, 1)
    host = F.regexp_replace(hostport, PORT_RE, "")
    port = F.when(port_s != "", port_s.cast("long"))
    path = F.regexp_extract(u, PATH_RE, 1)

    labels = F.split(host, r"\.", -1)
    n = F.size(labels)
    second = F.element_at(labels, n - 1)  # 1-indexed: second-to-last label
    reg_domain = (
        F.when(
            (n >= 3) & second.isin(*SECOND_LEVEL_TLDS),
            F.array_join(F.slice(labels, n - 2, 3), "."),
        )
        .when(n >= 2, F.array_join(F.slice(labels, n - 1, 2), "."))
        .otherwise(host)
    )

    default_port = (
        ((scheme == "http") & (port == DEFAULT_PORTS["http"]))
        | ((scheme == "https") & (port == DEFAULT_PORTS["https"]))
    )
    port_part = F.when(
        port.isNotNull() & ~default_port, F.concat(F.lit(":"), port.cast("string"))
    ).otherwise("")
    norm_path = F.when(path == "", "/").otherwise(path)
    url_norm = F.concat(scheme, F.lit("://"), host, port_part, norm_path)
    path_depth = F.size(F.filter(F.split(path, "/", -1), lambda s: s != "")).cast("long")

    return df.withColumns(
        {
            "scheme": scheme,
            "host": host,
            "port": port.cast("long"),
            "reg_domain": reg_domain,
            "path": path,
            "path_depth": path_depth,
            "url_norm": url_norm,
        }
    )


def domain_stats(parsed: DataFrame, blocklist: tuple[str, ...] = ()) -> DataFrame:
    """Per-registered-domain crawl dashboard over :func:`parse_urls`
    output: doc/host/normalized-url counts plus the blocklist flag — the
    table a crawl operator ranks to decide what to keep, throttle, or
    drop. The blocklist is registered-domain-level (how real blocklists
    ship); at production scale it is a broadcast dim joined on
    ``reg_domain``, here an ``isin`` literal for the bounded test list.

    One map-side-combining aggregate keyed on reg_domain; the output is
    bounded by the number of registered domains in the crawl (millions,
    not billions — always aggregable)."""
    blocked = (
        F.col("reg_domain").isin(*blocklist) if blocklist else F.lit(False)
    )
    return (
        parsed.groupBy("reg_domain")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("host").cast("long").alias("n_hosts"),
            F.countDistinct("url_norm").cast("long").alias("n_urls"),
            F.sum(F.col("path_depth")).cast("long").alias("sum_path_depth"),
        )
        .withColumn("blocked", blocked)
    )


def filter_lines(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C4-style line-level quality filter (Raffel et al. 2020 §2.2): a
    line survives iff it has >= LINE_MIN_WORDS whitespace words, ends in
    terminal punctuation ('.', '!', '?', or '"'), contains no curly
    brace (code/JSON boilerplate), and contains none of the lowercase
    blockwords (javascript / cookie / lorem ipsum). Returns per doc the
    line counts and ``clean_text`` — the surviving lines re-joined.

    Pure array expressions over one split — map-only at any scale."""
    lines = F.split(F.col(text_col), "\n", -1)

    def keep(line: Column) -> Column:
        s = F.trim(line)
        low = F.lower(s)
        n_words = F.size(F.filter(F.split(s, r"\s+", -1), lambda w: w != ""))
        blockhit = None
        for w in LINE_BLOCKWORDS:
            hit = low.contains(w)
            blockhit = hit if blockhit is None else (blockhit | hit)
        return (
            (n_words >= LINE_MIN_WORDS)
            & s.rlike(LINE_TERMINAL_RE)
            & ~s.contains("{")
            & ~s.contains("}")
            & ~blockhit
        )

    kept = F.filter(lines, keep)
    return df.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.array_join(kept, "\n").alias("clean_text"),
    )


def strip_markup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Naive-but-deterministic HTML-to-text: drop <script>/<style>
    blocks (content and all), count then strip every remaining tag,
    unescape the five core entities + nbsp ('&amp;' last — the exact
    inverse of escape-'&'-first), and collapse whitespace runs. The
    bronze-layer extraction for pages whose boilerplate is NOT the known
    deterministic wrap (pipeline/text.py:extract_text handles that exact
    inverse; this handles arbitrary markup a crawl actually contains).

    ``n_tags`` counts tags stripped AFTER script/style removal, so it
    measures structure, not embedded code. Map-only at any scale."""
    t = F.col(text_col)
    no_script = F.regexp_replace(t, SCRIPT_RE, " ")
    no_style = F.regexp_replace(no_script, STYLE_RE, " ")
    n_tags = _n_matches(no_style, TAG_RE)
    no_tags = F.regexp_replace(no_style, TAG_RE, " ")
    unescaped = no_tags
    for ent, rep in HTML_ENTITIES:
        unescaped = F.replace(unescaped, F.lit(ent), F.lit(rep))
    clean = F.trim(F.regexp_replace(unescaped, r"\s+", " "))
    return df.select(
        "doc_id", n_tags.alias("n_tags"), clean.alias("clean_text")
    )


def encoding_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Encoding-quality signals: U+FFFD replacement-character count
    (decoder already gave up), C0 control characters other than
    tab/newline/CR (binary junk in a text field), and UTF-8-read-as-
    latin1 mojibake digraphs ('Ã©' for 'é', ...). ``suspect`` is the
    integer disjunction — the row a curation pipeline quarantines for
    re-decoding rather than feeds to a tokenizer.

    Narrow per-row expressions — map-only at any scale."""
    t = F.col(text_col)
    n_repl = (
        F.length(t) - F.length(F.replace(t, F.lit(REPLACEMENT_CHAR), F.lit("")))
    ).cast("long")
    n_ctrl = _n_matches(t, CTRL_RE)
    n_moji = _n_matches(t, MOJIBAKE_RE)
    return df.select(
        "doc_id",
        n_repl.alias("n_repl_chars"),
        n_ctrl.alias("n_ctrl_chars"),
        n_moji.alias("n_mojibake"),
        ((n_repl > 0) | (n_ctrl > 0) | (n_moji > 0)).alias("suspect"),
    )


# --- hyperlink extraction -------------------------------------------------
HREF_RE = r'(?i)<a\s[^>]*href="([^"]*)"'
# two-group variant pairing each href with its anchor inner markup
ATAG_RE = r'(?is)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>'
CANONICAL_RE = r'(?i)<link\s[^>]*rel="canonical"[^>]*href="([^"]*)"'


def _resolve_link_expr(link_raw: Column) -> Column:
    """RFC-3986-lite resolution of ``link_raw`` against the page columns
    ``scheme``/``host``/``path`` (must be in scope, from parse_urls):
    absolute http(s) kept as-is, protocol-relative '//' gets the page
    scheme, root-relative '/' gets scheme://host, other relative paths
    join the page's parent directory; javascript:/mailto:/empty and
    fragment-only targets resolve to NULL (caller filters). Fragments
    are stripped first (two URLs differing only in fragment are the
    same fetch)."""
    t = F.regexp_replace(link_raw, "#.*$", "")
    low = F.lower(t)
    parent = F.regexp_replace(F.col("path"), "[^/]*$", "")
    parent = F.when(parent == "", "/").otherwise(parent)
    base = F.concat(F.col("scheme"), F.lit("://"), F.col("host"))
    return (
        F.when(low.startswith("http://") | low.startswith("https://"), t)
        .when(t.startswith("//"), F.concat(F.col("scheme"), F.lit(":"), t))
        .when(t.startswith("/"), F.concat(base, t))
        .when(
            (t == "") | low.startswith("javascript:") | low.startswith("mailto:"),
            F.lit(None).cast("string"),
        )
        .otherwise(F.concat(base, parent, t))
    )


def _host_of_expr(url: Column) -> Column:
    return F.lower(
        F.regexp_replace(F.regexp_extract(url, HOSTPORT_RE, 1), PORT_RE, "")
    )


def extract_links(df: DataFrame, url_col: str = "url", html_col: str = "html_text") -> DataFrame:
    """Extract and resolve hyperlinks from raw page markup — the crawl
    frontier / link-graph primitive (resolution semantics in
    :func:`_resolve_link_expr`).

    Returns (url, link_raw, link_url, link_host). Narrow: one
    regexp_extract_all + explode + per-row CASE resolution — map-only at
    any scale; the output is link-count-sized, never joined here."""
    page = parse_urls(df.select(url_col, html_col), url_col=url_col)
    raw = F.explode(
        F.regexp_extract_all(F.col(html_col), F.lit(HREF_RE), F.lit(1))
    ).alias("link_raw")
    e = page.select(url_col, "scheme", "host", "path", raw)
    out = e.select(
        url_col, "link_raw", _resolve_link_expr(F.col("link_raw")).alias("link_url")
    ).filter(F.col("link_url").isNotNull())
    return out.withColumn("link_host", _host_of_expr(F.col("link_url")))


def extract_anchors(df: DataFrame, url_col: str = "url", html_col: str = "html_text") -> DataFrame:
    """Anchor-TEXT harvesting — the web's free alias table: every
    (resolved link target, normalized anchor text) pair. Anchor text is
    how the linking page NAMES the target, so aggregated anchors are the
    highest-precision surface-form/alias signal a webtext KG gets
    (the classic anchor-text dictionary).

    The href and its inner markup are extracted as two capture groups of
    the SAME pattern (ATAG_RE) and re-paired positionally with
    arrays_zip; inner markup is tag-stripped, entity-light, whitespace-
    collapsed, lowercased to ``anchor_norm``. Empty-after-normalization
    anchors (image links) are kept as '' — droppable downstream.

    Narrow map-only, like extract_links."""
    page = parse_urls(df.select(url_col, html_col), url_col=url_col)
    h = F.col(html_col)
    pair = F.explode(
        F.arrays_zip(
            F.regexp_extract_all(h, F.lit(ATAG_RE), F.lit(1)),
            F.regexp_extract_all(h, F.lit(ATAG_RE), F.lit(2)),
        )
    ).alias("z")
    e = page.select(url_col, "scheme", "host", "path", pair)
    raw = F.col("z").getField("0")
    atext = F.col("z").getField("1")
    anorm = F.lower(
        F.trim(
            F.regexp_replace(F.regexp_replace(atext, TAG_RE, " "), r"\s+", " ")
        )
    )
    out = e.select(
        url_col,
        raw.alias("link_raw"),
        _resolve_link_expr(raw).alias("link_url"),
        anorm.alias("anchor_norm"),
    ).filter(F.col("link_url").isNotNull())
    return out.withColumn("link_host", _host_of_expr(F.col("link_url")))


def anchor_text_stats(anchors: DataFrame, url_col: str = "url") -> DataFrame:
    """Aggregate the anchor-text table per (target URL, normalized
    anchor): total occurrences + distinct linking pages — the ranked
    alias dictionary for a target. ONE map-side-combining aggregate;
    output bounded by distinct (target, anchor) pairs."""
    return (
        anchors.filter(F.col("anchor_norm") != "")
        .groupBy("link_url", "anchor_norm")
        .agg(
            F.count("*").cast("long").alias("n_anchors"),
            F.countDistinct(url_col).cast("long").alias("n_pages"),
        )
    )


def canonical_urls(df: DataFrame, url_col: str = "url", html_col: str = "html_text") -> DataFrame:
    """<link rel="canonical"> mapping — the publisher's own dedup signal:
    per page, the first declared canonical target resolved against the
    page URL, falling back to the page's normalized URL when absent (a
    page with no canonical IS its own canonical). ``is_self`` marks
    pages whose canonical equals their own normalized URL.

    Map-only; the output is the page->canonical mapping a dedup pass
    groups by INSTEAD of url_norm when markup provides it."""
    page = parse_urls(df.select(url_col, html_col), url_col=url_col)
    cand = F.regexp_extract(F.col(html_col), CANONICAL_RE, 1)
    resolved = F.when(cand != "", _resolve_link_expr(cand))
    canonical = F.coalesce(resolved, F.col("url_norm"))
    return page.select(
        url_col,
        "url_norm",
        canonical.alias("canonical_url"),
        (canonical == F.col("url_norm")).alias("is_self"),
    )


def host_link_graph(links: DataFrame, url_col: str = "url") -> DataFrame:
    """Host-level link graph over :func:`extract_links` output: per
    (src_host, dst_host), total anchor count + distinct linking pages,
    with an ``internal`` flag for same-host navigation. The web-graph
    edge table PageRank/authority scoring runs on (the existing
    graph ops — pagerank, k-core, components — consume exactly this
    shape).

    ONE map-side-combining aggregate keyed on the host pair; output is
    bounded by the distinct host-pair count. A hot edge (every page of a
    CMS linking its CDN) is a single reducer key — standard agg skew,
    AQE-handled."""
    src_host = F.lower(
        F.regexp_replace(
            F.regexp_extract(F.col(url_col), HOSTPORT_RE, 1), PORT_RE, ""
        )
    )
    return (
        links.select(
            src_host.alias("src_host"), "link_host", url_col
        )
        .groupBy("src_host", F.col("link_host").alias("dst_host"))
        .agg(
            F.count("*").cast("long").alias("n_links"),
            F.countDistinct(url_col).cast("long").alias("n_pages"),
        )
        .withColumn("internal", F.col("src_host") == F.col("dst_host"))
    )


def host_hits(
    graph: DataFrame, iterations: int = 2, scale: int = 1_000_000
) -> DataFrame:
    """Integer-arithmetic HITS (Kleinberg hubs & authorities) over the
    DIRECTED external host graph — the centrality pair PageRank does not
    give: a hub links to many good authorities, an authority is linked
    by many good hubs. Input is :func:`host_link_graph` output; internal
    (same-host) edges are excluded, edges are distinct host pairs.

    All arithmetic is INTEGER (the er.pagerank precedent): scores start
    at ``scale`` and each half-step is a sum over in-/out-neighbors
    followed by max-normalization ``x' = x * scale div max(x)`` — long
    division truncation is engine-independent, and the 1-row max joins
    as a broadcast cross join (never a driver collect). The DuckDB twin
    unrolls the same half-steps with scalar subqueries, so scores are
    bit-exact across engines.

    Scale shape: the distinct edge table is persisted once and reused
    2x per iteration; each half-step is one node-keyed equi-join + one
    map-side-combining sum over edges, O(iterations) rounds — the same
    shuffle pair as synchronous PageRank. The pre-normalization score
    table is persisted per half-step because it feeds two consumers
    (the max aggregate and the normalization join) — without it the
    score subtree is recomputed ~2x per half-step, compounding across
    iterations (measured 20.8 s -> seconds at sf0.1). Overflow bound: the
    normalization multiplies BEFORE dividing (sum * scale div max), and
    sum <= deg_max * scale, so deg_max * scale^2 must fit a long —
    scale 1e6 holds to deg_max ~9e6 in-links on one host; beyond that
    drop scale (documented knob; ANSI mode fails loudly, never silently
    wraps)."""
    from unsupervised_ner_spark.caching import scoped_persist

    edges = scoped_persist(
        graph.filter(~F.col("internal"))
        .select("src_host", "dst_host")
        .distinct(),
        how="checkpoint",
    )
    nodes = scoped_persist(
        edges.select(F.col("src_host").alias("host"))
        .unionAll(edges.select(F.col("dst_host").alias("host")))
        .distinct(),
        how="checkpoint",
    )
    hub = nodes.select("host", F.lit(scale).cast("long").alias("hub"))
    auth = None
    for _ in range(iterations):
        # authority half-step: sum of in-neighbor hub scores
        a_raw = (
            edges.join(hub.withColumnRenamed("host", "src_host"), "src_host")
            .groupBy("dst_host")
            .agg(F.sum("hub").alias("a"))
            .select(F.col("dst_host").alias("host"), "a")
        )
        # a_all feeds TWO consumers (the max aggregate and the
        # normalization join); without a persist the subtree is evaluated
        # twice per half-step and the duplication compounds ~2x per
        # half-step across iterations. Node-sized table — cheap to cache.
        a_all = scoped_persist(
            nodes.join(a_raw, "host", "left").select(
                "host", F.coalesce(F.col("a"), F.lit(0)).cast("long").alias("a")
            ),
            how="checkpoint",
        )
        amax = a_all.agg(F.greatest(F.max("a"), F.lit(1)).alias("amax"))
        auth = a_all.crossJoin(F.broadcast(amax)).select(
            "host", F.expr(f"(a * CAST({scale} AS BIGINT)) div amax").alias("auth")
        )
        # hub half-step: sum of out-neighbor authority scores
        h_raw = (
            edges.join(auth.withColumnRenamed("host", "dst_host"), "dst_host")
            .groupBy("src_host")
            .agg(F.sum("auth").alias("h"))
            .select(F.col("src_host").alias("host"), "h")
        )
        h_all = scoped_persist(
            nodes.join(h_raw, "host", "left").select(
                "host", F.coalesce(F.col("h"), F.lit(0)).cast("long").alias("h")
            ),
            how="checkpoint",
        )
        hmax = h_all.agg(F.greatest(F.max("h"), F.lit(1)).alias("hmax"))
        hub = h_all.crossJoin(F.broadcast(hmax)).select(
            "host", F.expr(f"(h * CAST({scale} AS BIGINT)) div hmax").alias("hub")
        )
    return hub.join(auth, "host").select(
        "host", F.col("hub").alias("hub_scaled"), F.col("auth").alias("auth_scaled")
    )


def canonical_dedup_groups(canon: DataFrame) -> DataFrame:
    """Publisher-declared dedup groups over :func:`canonical_urls`
    output: pages grouped by their canonical target, with size and the
    deterministic representative (lexicographic-min member url_norm) —
    the dedup pass a crawl runs BEFORE any content hashing, because the
    markup already told us. ONE map-side-combining aggregate."""
    return canon.groupBy("canonical_url").agg(
        F.count("*").cast("long").alias("n_pages"),
        F.min("url_norm").alias("representative"),
        F.sum(F.col("is_self").cast("long")).cast("long").alias("n_self"),
    )


def crawl_frontier(parsed: DataFrame, k: int = 3) -> DataFrame:
    """Politeness-bounded crawl-frontier selection: from the parsed URL
    table, pick at most ``k`` URLs per host by a deterministic md5
    priority — the per-host budget allocation a crawler's scheduler runs
    every cycle (hash priority = an unbiased, reproducible sample of each
    host's frontier; a real scheduler swaps in its score column, the plan
    shape is identical). Duplicate ``url_norm`` rows (same page, different
    tracking params) collapse first to their min doc_id, so the budget
    is spent on distinct pages.

    Scale shape: one (host, url_norm)-keyed dedup aggregate, then ONE
    window partitioned by host — partition size is a host's distinct-URL
    count (crawl frontiers are host-bounded by construction; a megahost
    is one partition, the same exposure the per-host politeness queue has
    anyway), never corpus-wide. The host-total count rides the same
    window (no second aggregate + join)."""
    from pyspark.sql import Window

    dedup = (
        parsed.groupBy("host", "url_norm")
        .agg(F.min("doc_id").cast("long").alias("doc_id"))
        .withColumn("priority", F.md5(F.col("url_norm")))
    )
    w = Window.partitionBy("host")
    wo = w.orderBy(F.asc("priority"), F.asc("url_norm"))
    ranked = dedup.select(
        "host", "url_norm", "doc_id", "priority",
        F.row_number().over(wo).cast("long").alias("rank"),
        F.count("*").over(w).cast("long").alias("n_host_urls"),
    )
    return ranked.filter(F.col("rank") <= k)


def url_templates(parsed: DataFrame) -> DataFrame:
    """Path-template mining over :func:`parse_urls` output: collapse every
    digit run in the path to ``N`` and aggregate per (reg_domain,
    template) — the spam/boilerplate-pattern detector (calendar pages,
    paginated listings, session-id URLs) crawl curation uses to down-weight
    template-generated content BEFORE fetching content hashes. Output:
    (reg_domain, path_template, n_urls, n_hosts, n_docs, sample_doc_id —
    the deterministic min doc per template).

    Scale shape: ONE narrow projection (regexp on the already-parsed path)
    + ONE map-side-combining aggregate keyed on (domain, template) — the
    template key collapses exactly the explosive part of the URL space, so
    the aggregate output is bounded by distinct site layouts, not by
    crawl size."""
    t = parsed.select(
        "reg_domain",
        F.regexp_replace(F.col("path"), "[0-9]+", "N").alias("path_template"),
        "host",
        "url_norm",
        "doc_id",
    )
    return t.groupBy("reg_domain", "path_template").agg(
        F.countDistinct("url_norm").cast("long").alias("n_urls"),
        F.countDistinct("host").cast("long").alias("n_hosts"),
        F.count("*").cast("long").alias("n_docs"),
        F.min("doc_id").cast("long").alias("sample_doc_id"),
    )


# --- WET-record parsing ----------------------------------------------------
WET_HEADER = "WARC/1.0\n"


def build_wet_files(documents: DataFrame, docs_per_file: int = 10) -> DataFrame:
    """Deterministic WET-style archive synthesis (the inverse of
    :func:`parse_wet_records`, used by the gate): docs_per_file documents
    concatenated in doc_id order as
    ``WARC/1.0\\nWARC-Target-URI: <uri>\\nContent-Length: <n>\\n\\n<text>\\n\\n``
    records. Content-Length counts CHARACTERS (a documented simplification
    of the byte-counting WET spec so both engines substring identically
    on non-ASCII text)."""
    rec = F.concat(
        F.lit(WET_HEADER),
        F.lit("WARC-Target-URI: https://crawl.example/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("\nContent-Length: "),
        F.length("text").cast("string"),
        F.lit("\n\n"),
        F.col("text"),
        F.lit("\n\n"),
    )
    per = documents.select(
        F.expr(f"CAST(doc_id AS BIGINT) div {int(docs_per_file)}").alias("file_id"),
        F.struct(F.col("doc_id").cast("long").alias("doc_id"), rec.alias("rec")).alias("s"),
    )
    return per.groupBy("file_id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("s")), lambda x: x["rec"]), ""
        ).alias("blob")
    )


def parse_wet_records(wet: DataFrame) -> DataFrame:
    """Parse WET-style plain-text archives (Common Crawl's extracted-text
    format — the reference consumes exactly this kind of pre-extracted
    text, batched_main_NER.py:800-811) into one row per record:
    (file_id, record_idx, uri, content_length, body). The body is cut by
    Content-Length (character-counted, see :func:`build_wet_files`), NOT
    by a terminator regex — bodies may contain anything, including
    record-separator look-alikes.

    Scale shape: pure string expressions (split + posexplode + substr) —
    map-only, no Python, no shuffle; one input row (a WET file) fans out
    to its records in place. At real CC scale a WET file is read as one
    ``binaryFile`` row (~150 MB compressed) and this same logic runs over
    the decompressed text; per-file memory is the only constraint, the
    standard WET-reader tradeoff."""
    parts = F.split(F.col("blob"), "WARC/1\\.0\n", -1)
    recs = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))
    exploded = wet.select("file_id", F.posexplode(recs).alias("record_idx", "rec"))
    # \S+ (URIs carry no whitespace) keeps the pattern newline-free so the
    # DuckDB twin can embed it in a plain SQL literal
    uri = F.regexp_extract(F.col("rec"), r"WARC-Target-URI: (\S+)", 1)
    clen = F.regexp_extract(F.col("rec"), r"Content-Length: ([0-9]+)", 1).cast("long")
    body_start = F.instr(F.col("rec"), "\n\n") + 2
    return exploded.select(
        "file_id",
        F.col("record_idx").cast("long").alias("record_idx"),
        uri.alias("uri"),
        clen.alias("content_length"),
        F.col("rec").substr(body_start, clen.cast("int")).alias("body"),
    )


# --- robots.txt rules ------------------------------------------------------


def robots_rules(hosts: DataFrame) -> DataFrame:
    """Deterministic per-host robots rule table (stand-in for fetching
    /robots.txt; the parse of a real file is the same three-column
    normalization): a catch-all Allow '/', a host-derived
    ``Disallow /cat<h>/`` (h = strlen(host) mod 7), and a longer
    ``Allow /cat<h>/page-1`` carve-out — so default-allow, prefix-deny,
    and longest-match-override all occur. Input: distinct (host). Output:
    (host, prefix, allow)."""
    h = F.pmod(F.length("host"), 7).cast("string")
    base = hosts.select("host").distinct()
    r1 = base.select("host", F.lit("/").alias("prefix"), F.lit(True).alias("allow"))
    r2 = base.select(
        "host",
        F.concat(F.lit("/cat"), h, F.lit("/")).alias("prefix"),
        F.lit(False).alias("allow"),
    )
    r3 = base.select(
        "host",
        F.concat(F.lit("/cat"), h, F.lit("/page-1")).alias("prefix"),
        F.lit(True).alias("allow"),
    )
    return r1.unionByName(r2).unionByName(r3)


def robots_allowed(parsed: DataFrame, rules: DataFrame) -> DataFrame:
    """Robots-exclusion decision per URL (RFC 9309 semantics): among the
    host's rules whose prefix is a prefix of the path, the LONGEST match
    wins, Allow beating Disallow on equal length. URLs with no matching
    rule (no '/' catch-all either) default to allowed.

    Output: (doc_id, host, path, match_prefix, allowed).

    Scale shape: the rules table is host-keyed and small relative to the
    crawl (rules-per-host is a constant; distinct hosts << pages), so the
    host equi-join broadcasts at dim scale or shuffles on host otherwise;
    the winner pick is a per-URL window over the handful of matching
    rules — partition size = matches per URL, a constant. Prefix match is
    substring-compare (no regex, no LIKE-escape hazard) identically on
    both engines."""
    from pyspark.sql import Window

    j = parsed.select("doc_id", "host", "path").join(rules, "host", "left")
    m = j.filter(
        F.expr("substring(path, 1, length(prefix)) = prefix")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc(F.length("prefix")), F.desc("allow")
    )
    best = m.select(
        "doc_id", "host", "path", "prefix", "allow",
        F.row_number().over(w).alias("rnk"),
    ).filter(F.col("rnk") == 1)
    return (
        parsed.select("doc_id", "host", "path")
        .join(
            best.select("doc_id", F.col("prefix").alias("match_prefix"), "allow"),
            "doc_id",
            "left",
        )
        .select(
            "doc_id", "host", "path",
            F.coalesce(F.col("match_prefix"), F.lit("")).alias("match_prefix"),
            F.coalesce(F.col("allow"), F.lit(True)).alias("allowed"),
        )
    )


# --- temporal expressions (agreement subset: classes, alternation,
# bounded quantifiers — no lookaround) ------------------------------------
MONTHS = (
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December",
)
ISO_DATE_RE = r"\b(\d{4})-(\d{2})-(\d{2})\b"
TEXT_DATE_RE = r"\b(" + "|".join(MONTHS) + r") (\d{1,2}), (\d{4})\b"


def extract_dates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Temporal-expression extraction + normalization — the fact-
    timestamping primitive of KG construction (a triple grounded in a
    sentence inherits that sentence's dates; the as-of/SCD2 operators
    downstream consume exactly this shape). Two pattern families:
    ISO ``YYYY-MM-DD`` and textual ``Month D, YYYY``, both normalized to
    the ISO string so downstream date logic is representation-blind.
    Patterns are module constants imported by the DuckDB oracle.

    Returns one row per extracted occurrence:
    (doc_id, kind 'iso'|'text', date_iso, raw).

    Scale shape: pure map — two regexp_extract_all + explodes inside
    whole-stage codegen, rows bounded by matches; no exchange at all.
    """
    months_arr = F.array(*[F.lit(m) for m in MONTHS])
    iso = df.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(text_col, F.lit(ISO_DATE_RE), F.lit(0))
        ).alias("raw"),
    ).select(
        "doc_id",
        F.lit("iso").alias("kind"),
        F.col("raw").alias("date_iso"),
        "raw",
    )
    txt = df.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(text_col, F.lit(TEXT_DATE_RE), F.lit(0))
        ).alias("raw"),
    )
    month_num = F.array_position(
        months_arr, F.regexp_extract("raw", TEXT_DATE_RE, 1)
    )
    txt = txt.select(
        "doc_id",
        F.lit("text").alias("kind"),
        F.concat(
            F.regexp_extract("raw", TEXT_DATE_RE, 3),
            F.lit("-"),
            F.lpad(month_num.cast("string"), 2, "0"),
            F.lit("-"),
            F.lpad(F.regexp_extract("raw", TEXT_DATE_RE, 2), 2, "0"),
        ).alias("date_iso"),
        "raw",
    )
    return iso.unionByName(txt)


# --- table / infobox extraction (agreement subset: inline flags,
# non-greedy, classes — no lookaround) ------------------------------------
TABLE_RE = r"(?is)<table[^>]*>(.*?)</table>"
TR_RE = r"(?is)<tr[^>]*>(.*?)</tr>"
CELL_RE = r"(?is)<t[dh][^>]*>(.*?)</t[dh]>"


def extract_tables(df: DataFrame, text_col: str = "text") -> DataFrame:
    """HTML table / infobox fact extraction — the Wikipedia-infobox-style
    KV harvest that seeds a KG from semi-structured web pages (the
    DBpedia extraction-framework shape). Tables explode to rows, rows to
    cells; the first two tag-stripped cells become (key, value); rows
    with fewer than two cells (spanners, separators) are dropped.
    Returns (doc_id, table_idx, row_idx, key, value, n_cells).

    Scale shape: pure map — three nested regexp_extract_all + posexplode
    stages inside whole-stage codegen, rows bounded by the page's own
    table cells; no exchange, no join. Regex constants are imported by
    the DuckDB oracle."""

    def clean(c: Column) -> Column:
        return F.trim(F.regexp_replace(c, TAG_RE, ""))

    tbl = df.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(text_col, F.lit(TABLE_RE), F.lit(1))
        ).alias("table_idx", "tbl"),
    )
    rows = tbl.select(
        "doc_id",
        "table_idx",
        F.posexplode(
            F.regexp_extract_all("tbl", F.lit(TR_RE), F.lit(1))
        ).alias("row_idx", "rowhtml"),
    )
    cells = rows.withColumn(
        "cells", F.regexp_extract_all("rowhtml", F.lit(CELL_RE), F.lit(1))
    )
    return (
        cells.filter(F.size("cells") >= 2)
        .select(
            "doc_id",
            F.col("table_idx").cast("long").alias("table_idx"),
            F.col("row_idx").cast("long").alias("row_idx"),
            clean(F.get("cells", 0)).alias("key"),
            clean(F.get("cells", 1)).alias("value"),
            F.size("cells").cast("long").alias("n_cells"),
        )
    )


def build_sitemaps(documents: DataFrame) -> DataFrame:
    """Deterministic per-host XML sitemaps (stand-in for fetching
    /sitemap.xml — the robots_rules precedent; parsing a real file is
    the same regex projection): every document becomes one ``<url>``
    entry (loc / lastmod / changefreq / priority, all doc_id-derived so
    every parse branch occurs), grouped under 17 synthetic hosts with
    entries concatenated in doc_id order. Output: (host, xml).

    Scale shape: one map + one map-side-combining aggregate keyed on
    host; the per-host collect is bounded by pages-per-host (a real
    sitemap is capped at 50k URLs by spec — the same envelope)."""
    did = F.col("doc_id")
    host = F.concat(
        F.lit("site-"), F.pmod(did, 17).cast("string"), F.lit(".example.com")
    )
    lastmod = F.concat(
        F.lit("2024-"),
        F.lpad((F.pmod(did, 12) + 1).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad((F.pmod(did, 28) + 1).cast("string"), 2, "0"),
    )
    changefreq = F.element_at(
        F.array(F.lit("daily"), F.lit("weekly"), F.lit("monthly")),
        (F.pmod(did, 3) + 1).cast("int"),
    )
    entry = F.concat(
        F.lit("<url><loc>https://"), host,
        F.lit("/page-"), did.cast("string"), F.lit(".html</loc>"),
        F.lit("<lastmod>"), lastmod, F.lit("</lastmod>"),
        F.lit("<changefreq>"), changefreq, F.lit("</changefreq>"),
        F.lit("<priority>0."), F.pmod(did, 10).cast("string"),
        F.lit("</priority></url>"),
    )
    g = documents.select(host.alias("host"), did.alias("doc_id"),
                         entry.alias("entry"))
    agg = g.groupBy("host").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("doc_id", "entry"))),
                lambda s: s["entry"],
            ),
            "",
        ).alias("body")
    )
    return agg.select(
        "host",
        F.concat(
            F.lit('<?xml version="1.0"?><urlset>'), F.col("body"),
            F.lit("</urlset>"),
        ).alias("xml"),
    )


def parse_sitemaps(sitemaps: DataFrame) -> DataFrame:
    """Sitemap-protocol parser (sitemaps.org XML): split the ``<urlset>``
    into ``<url>`` entries (position-preserving), project loc / lastmod /
    changefreq and the priority as an exact integer percentage — the
    crawl-scheduler input beside robots_allowed and crawl_frontier.
    Output: (host, entry_idx, loc, lastmod, changefreq, priority_pct).

    Scale shape: pure map (regexp_extract_all + posexplode + per-entry
    regexp projections, all codegen; entry arrays bounded by the 50k/
    sitemap spec cap); no exchange, no join."""
    ents = F.regexp_extract_all(F.col("xml"), F.lit("<url>(.*?)</url>"), 1)
    ex = sitemaps.select("host", F.posexplode(ents).alias("entry_idx", "e"))

    def field(tag):
        return F.regexp_extract(F.col("e"), f"<{tag}>([^<]*)</{tag}>", 1)

    return ex.select(
        "host",
        F.col("entry_idx").cast("long").alias("entry_idx"),
        field("loc").alias("loc"),
        field("lastmod").alias("lastmod"),
        field("changefreq").alias("changefreq"),
        (
            F.coalesce(
                F.nullif(
                    F.regexp_extract(
                        F.col("e"), r"<priority>0\.([0-9])</priority>", 1
                    ),
                    F.lit(""),
                ).cast("long"),
                F.lit(0),
            ) * 10
        ).cast("long").alias("priority_pct"),
    ).filter(F.length("loc") > 0)


def redirect_chains(
    edges: DataFrame, max_rounds: int = 20
) -> DataFrame:
    """Resolve redirect / rel=canonical chains to their terminal URL by
    pointer doubling — the canonicalization pass a crawl pipeline runs
    before dedup (a page crawled via 3 layers of 301s must collapse to
    one provenance key). ``edges`` is the FUNCTIONAL graph (src, dst):
    at most one outgoing edge per src; a URL with no row is terminal.
    Returns (url, canonical_url, hops) for every non-terminal src with
    the exact hop distance to its terminal.

    Pointer doubling: each round every pointer jumps over its
    successor's pointer (ptr[x] = ptr[ptr[x]], hops add), so an L-hop
    chain resolves in ceil(log2 L) rounds — the path-doubling device
    (Valiant '82 list ranking), NOT per-hop iteration: 10^12 pages of
    30-hop redirect chains converge in 5 rounds of entity-keyed
    equi-joins. Convergence is an O(1)-row driver check (count of
    still-jumpable pointers — the er.py CC fingerprint precedent);
    ``max_rounds`` bounds cyclic-input pathology loudly (a genuine
    redirect CYCLE never resolves — the guard raises rather than
    silently emitting a partial pointer).

    Scale shape: each round is ONE self equi-join of the pointer table
    on the jump key plus a narrow coalesce; the pointer table never
    exceeds the edge count; hot terminals (every page of a site 301ing
    to its root) are join-KEY fan-in on the probe side, standard AQE
    skew territory."""
    from unsupervised_ner_spark.caching import scoped_persist

    ptr = scoped_persist(
        edges.select(
            F.col("src").alias("url"),
            F.col("dst").alias("nxt"),
            F.lit(1).cast("long").alias("hops"),
        )
    )
    for _ in range(max_rounds):
        jump = ptr.select(
            F.col("url").alias("j_url"),
            F.col("nxt").alias("j_nxt"),
            F.col("hops").alias("j_hops"),
        )
        nxt = scoped_persist(
            ptr.join(jump, ptr.nxt == jump.j_url, "left").select(
                "url",
                F.coalesce("j_nxt", "nxt").alias("nxt"),
                (F.col("hops") + F.coalesce("j_hops", F.lit(0)))
                .cast("long").alias("hops"),
            )
        )
        # O(1) driver action: pointers still landing on a non-terminal
        remaining = nxt.join(
            jump.select(F.col("j_url").alias("nxt")), "nxt", "semi"
        ).count()
        ptr = nxt
        if remaining == 0:
            return ptr.select(
                "url", F.col("nxt").alias("canonical_url"), "hops"
            )
    raise ValueError(
        f"redirect_chains did not converge in {max_rounds} rounds — "
        "the edge table contains a cycle (or chains past "
        f"2^{max_rounds} hops)"
    )


def canonical_conflicts(
    edges: DataFrame, pages: DataFrame, max_rounds: int = 20
) -> DataFrame:
    """Canonical-group content audit — the data-quality read AFTER
    redirect_chains: every page resolves to its canonical terminal (pages
    with no outgoing edge are their own canonical), groups sharing a
    canonical are fingerprint-compared, and a group whose members carry
    MORE THAN ONE distinct content fingerprint is flagged — a mis-set
    rel=canonical (distinct content collapsed into one provenance key)
    silently deletes real documents in the dedup pass downstream; this
    table is the guard that catches it first. ``pages`` is (url, fp).

    Scale shape: rides redirect_chains (log-round pointer doubling);
    terminals are an anti-join of pages against edge sources; the
    fingerprint join is url-keyed; ONE canonical-keyed aggregate ends it
    (countDistinct over a group's fingerprints — group sizes are chain
    lengths, bounded by crawl policy, not corpus size)."""
    chains = redirect_chains(edges, max_rounds=max_rounds).select(
        "url", "canonical_url"
    )
    terminals = pages.join(
        edges.select(F.col("src").alias("url")), "url", "anti"
    ).select("url", F.col("url").alias("canonical_url"))
    members = chains.unionByName(terminals)
    return (
        members.join(pages, "url")
        .groupBy("canonical_url")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("fp").cast("long").alias("n_fingerprints"),
        )
        .withColumn(
            "is_conflict",
            F.when(F.col("n_fingerprints") > 1, 1).otherwise(0).cast("long"),
        )
    )
