"""Hearst-pattern taxonomy induction: sentences -> (hyponym, hypernym)
is-a edges, the classic lexico-syntactic KG-schema bootstrap (Hearst 1992)
on top of the engine's sentence table.

Two patterns, each extracted at most ONCE per sentence (first occurrence —
``regexp_extract`` semantics, identical in Spark and DuckDB):

- ``isa``:     "<Entity> is a|an <noun>"        -> (entity, noun)
- ``such_as``: "<noun>s such as <Entity>"       -> (entity, noun)

The entity side is a capitalized token run, the class side a lowercase
noun; the hyponym is lowercased on output so both patterns aggregate onto
the same normalized node key. Patterns are restricted to the Java-regex /
RE2 agreement subset (character classes, non-capturing groups, no
lookaround or backreferences — the txt_redact precedent), and the DuckDB
oracle imports these exact strings so the twins cannot drift.

Scale shape: one narrow regexp scan over sentences (two extraction
branches unioned — still a single pass over each row, no join), then one
map-side-combining aggregate keyed on the bounded (hypo, hyper, pattern)
edge space. A hot edge is one reducer key; nothing here is corpus-
quadratic, and the scan inherits the sentence table's partitioning.

Reference parity note: the reference has no taxonomy stage — this is an
engine-new operator in the "large-scale KG/training-data pipeline"
family (like dedup/ANN), not a port of a reference file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Capitalized token run = entity candidate; lowercase noun = class label.
ISA_PAT = "([A-Z][A-Za-z0-9]*(?: [A-Z][A-Za-z0-9]*)*) is (?:a|an) ([a-z][a-z0-9]*)"
SUCHAS_PAT = "([a-z][a-z0-9]*)s such as ([A-Z][A-Za-z0-9]*(?: [A-Z][A-Za-z0-9]*)*)"


def hearst_hypernyms(sentences: DataFrame) -> DataFrame:
    """sentences(url, sent_idx, sent) -> (hypo, hyper, pattern, n_sents,
    n_docs): corpus-aggregated is-a edges from the two Hearst patterns."""
    isa = sentences.select(
        "url",
        F.lower(F.regexp_extract("sent", ISA_PAT, 1)).alias("hypo"),
        F.regexp_extract("sent", ISA_PAT, 2).alias("hyper"),
        F.lit("isa").alias("pattern"),
    )
    such_as = sentences.select(
        "url",
        F.lower(F.regexp_extract("sent", SUCHAS_PAT, 2)).alias("hypo"),
        F.regexp_extract("sent", SUCHAS_PAT, 1).alias("hyper"),
        F.lit("such_as").alias("pattern"),
    )
    cand = isa.unionByName(such_as).filter(
        (F.length("hypo") > 0) & (F.length("hyper") > 0)
    )
    return cand.groupBy("hypo", "hyper", "pattern").agg(
        F.count("*").cast("long").alias("n_sents"),
        F.countDistinct("url").cast("long").alias("n_docs"),
    )


def taxonomy_closure_2hop(edges: DataFrame) -> DataFrame:
    """2-hop subclass closure over the Hearst edge table: (hypo -> mid ->
    hyper) paths with path support = least of the two edge supports — the
    taxonomy-consistency product (is-a transitivity candidates a curator
    reviews, and the input to cycle/conflict checks).

    Edges are first collapsed across patterns (one row per (hypo, hyper),
    summed sentence support); the closure is a mid-keyed self-join of the
    collapsed table with the trivial hypo==hyper loop filtered.

    Scale shape: the collapsed edge table is bounded by distinct taxonomy
    edges (vocabulary-sized, not corpus-sized) and persisted once — it
    feeds both self-join sides, so the corpus-scanning Hearst chain above
    it runs exactly once; the self-join keys on the mid node — a hub
    class ("thing") fans out as deg_in(mid) x deg_out(mid), the same
    bounded-wedge shape as kg_common_neighbors."""
    from unsupervised_ner_spark.caching import scoped_persist

    base = scoped_persist(
        edges.groupBy("hypo", "hyper").agg(
            F.sum("n_sents").cast("long").alias("n")
        )
    )
    a = base.select(
        "hypo", F.col("hyper").alias("mid"), F.col("n").alias("n1")
    )
    b = base.select(
        F.col("hypo").alias("mid"), "hyper", F.col("n").alias("n2")
    )
    return (
        a.join(b, "mid")
        .filter(F.col("hypo") != F.col("hyper"))
        .select(
            "hypo", "mid", "hyper",
            F.least("n1", "n2").cast("long").alias("support"),
        )
    )


# Appositive instance-typing: "<Entity>, a|an <noun>," — the third classic
# lexico-syntactic typing pattern (complements isa/such_as above). Same
# Java-regex / RE2 agreement subset; the oracle imports this string.
APPOS_PAT = "([A-Z][A-Za-z0-9]*(?: [A-Z][A-Za-z0-9]*)*), (?:a|an) ([a-z][a-z0-9]*),"


def appositive_types(sentences: DataFrame) -> DataFrame:
    """sentences(url, sent_idx, sent) -> (inst, cls, n_sents, n_docs):
    corpus-aggregated instance-of edges from the appositive pattern
    "<Entity>, a <noun>," (first match per sentence — ``regexp_extract``
    semantics, identical in Spark and DuckDB), instance lowercased onto
    the same normalized node key as the Hearst extractors.

    Scale shape: identical to hearst_hypernyms — one narrow regexp scan,
    one map-side-combining aggregate on the bounded (inst, cls) edge
    space; no join, nothing corpus-quadratic."""
    cand = sentences.select(
        "url",
        F.lower(F.regexp_extract("sent", APPOS_PAT, 1)).alias("inst"),
        F.regexp_extract("sent", APPOS_PAT, 2).alias("cls"),
    ).filter((F.length("inst") > 0) & (F.length("cls") > 0))
    return cand.groupBy("inst", "cls").agg(
        F.count("*").cast("long").alias("n_sents"),
        F.countDistinct("url").cast("long").alias("n_docs"),
    )


def taxonomy_closure(edges: DataFrame, max_hops: int = 8) -> DataFrame:
    """Min-hop transitive closure of the taxonomy edge table, capped at
    ``max_hops`` — the full is-a reachability product (what every
    subclass-inference and type-propagation pass consumes), extending the
    fixed 2-hop product above to arbitrary (bounded) depth.

    Returns (hypo, hyper, hops) where hops is the LENGTH OF THE SHORTEST
    is-a path (1 = direct edge), self-pairs excluded; pairs whose shortest
    path exceeds ``max_hops`` are absent. The cap makes the product
    well-defined on noisy Hearst graphs with cycles (a <-> b loops would
    otherwise make the closure a fixpoint the oracle cannot bound).

    Scale shape: ITERATIVE DOUBLING (min-plus matrix squaring) — round r
    covers every shortest path of length <= 2^r, so depth ``max_hops``
    needs only ceil(log2(max_hops)) self-join rounds (3 for the default 8)
    instead of max_hops-1 BFS expansion rounds: O(log d) shuffles, the
    same round-compression trick as the ER large/small-star CC loop. Each
    round is one equi-join of the current distance table with itself
    keyed on the middle node plus one min-combining aggregate; the
    distance table is bounded by |closure| (vocabulary-squared worst
    case, taxonomy-sparse in practice), never corpus-sized. Rounds
    localCheckpoint so the plan does not triple per round (kcore
    precedent). The DuckDB twin replays it as a depth-capped RECURSIVE
    CTE with min(hops) — linear recursion and doubling agree exactly
    because both compute shortest-path length <= max_hops."""
    rounds = max(1, (max_hops - 1).bit_length())  # ceil(log2(max_hops))
    dist = (
        edges.select("hypo", "hyper")
        .filter(F.col("hypo") != F.col("hyper"))
        .distinct()
        .withColumn("hops", F.lit(1).cast("long"))
        .localCheckpoint()
    )
    dist = _minplus_rounds(dist, rounds, max_hops)
    return dist.filter(F.col("hypo") != F.col("hyper"))


def transitive_reduction(edges: DataFrame, max_hops: int = 8) -> DataFrame:
    """Transitive-reduction flags over the collapsed taxonomy edge table:
    an edge (a, b) is REDUNDANT when some intermediate m is reachable
    from a and reaches b (both within the ``max_hops``-capped closure) —
    the minimal-edge-set view a taxonomy curator publishes (Aho, Garey &
    Ullman 1972), relative to the same capped closure the query above
    gates. Returns every collapsed edge as (hypo, hyper, n, redundant)
    with n = summed sentence support and redundant an integer 0/1 flag.

    Scale shape: the closure (vocabulary-bounded) is persisted once and
    feeds both sides of ONE wedge-shaped self-join keyed on the middle
    node (the kg_common_neighbors shape); witnesses are distinct-reduced
    to pair granularity before the final left join onto the edge table.
    Nothing corpus-sized is joined."""
    from unsupervised_ner_spark.caching import scoped_persist

    base = edges.groupBy("hypo", "hyper").agg(
        F.sum("n_sents").cast("long").alias("n")
    ).filter(F.col("hypo") != F.col("hyper"))
    clo = scoped_persist(taxonomy_closure(edges, max_hops=max_hops))
    wit = (
        clo.select("hypo", F.col("hyper").alias("mid"))
        .join(clo.select(F.col("hypo").alias("mid"), "hyper"), "mid")
        .select("hypo", "hyper")
        .distinct()
        .withColumn("redundant", F.lit(1).cast("long"))
    )
    return (
        base.join(wit, ["hypo", "hyper"], "left")
        .select(
            "hypo", "hyper", "n",
            F.coalesce("redundant", F.lit(0)).cast("long").alias("redundant"),
        )
    )


def _minplus_rounds(dist: DataFrame, rounds: int, max_hops: int) -> DataFrame:
    """Min-plus squaring rounds shared by the full and incremental
    closures: round r extends coverage to shortest walks decomposable
    into <= 2^r entries of the seed table."""
    for _ in range(rounds):
        a = dist.select(
            "hypo", F.col("hyper").alias("mid"), F.col("hops").alias("h1")
        )
        b = dist.select(
            F.col("hypo").alias("mid"), "hyper", F.col("hops").alias("h2")
        )
        step = (
            a.join(b, "mid")
            .select("hypo", "hyper", (F.col("h1") + F.col("h2")).alias("hops"))
            .filter(F.col("hops") <= max_hops)
        )
        dist = (
            dist.unionByName(step)
            .groupBy("hypo", "hyper")
            .agg(F.min("hops").cast("long").alias("hops"))
            .localCheckpoint()
        )
    return dist


def taxonomy_closure_incremental(
    old_closure: DataFrame, delta_edges: DataFrame, max_hops: int = 8
) -> DataFrame:
    """INCREMENTAL maintenance of the capped min-hop closure (the IVM
    family: kg_cooccurrence_delta / er_components_delta precedents): fold
    a batch of NEW taxonomy edges into yesterday's closure without
    re-deriving anything from the old corpus.

    Exactness: seed the min-plus rounds with D0 = old_closure UNION
    delta_edges(hops=1). Every single edge of the merged graph is a D0
    entry (the old closure contains its hops=1 rows), so any merged-graph
    walk of length L <= max_hops decomposes into <= L D0 entries and
    ceil(log2(max_hops)) rounds reach it; old-closure entries are upper
    bounds in the merged graph and the min over decompositions (which
    includes the all-single-edge one) restores the true minimum. The
    result therefore EQUALS the full recompute — which is exactly what
    the hash gate proves (the incremental==full proof pattern).

    Scale: cost is O(|closure| + |delta|) join work per nightly batch —
    the corpus-scanning Hearst chain runs only over the delta documents,
    never again over history."""
    d0 = (
        old_closure.select("hypo", "hyper", "hops")
        .unionByName(
            delta_edges.select("hypo", "hyper")
            .filter(F.col("hypo") != F.col("hyper"))
            .distinct()
            .withColumn("hops", F.lit(1).cast("long"))
        )
        .groupBy("hypo", "hyper")
        .agg(F.min("hops").cast("long").alias("hops"))
        .localCheckpoint()
    )
    rounds = max(1, (max_hops - 1).bit_length())
    return _minplus_rounds(d0, rounds, max_hops).filter(
        F.col("hypo") != F.col("hyper")
    )


def taxonomy_depth(closure: DataFrame) -> DataFrame:
    """Ontology depth layering over the (capped) is-a closure — the
    DAG-level assignment ontology curation asks for first (how deep is
    each concept, how many independent roots subsume it): a node's depth
    is the LONGEST root-path length within the closure cap, the layer a
    topological layout or a level-wise materialization schedule uses.

    Roots are hypers that never occur as a hypo (cycle members occur as
    hypos, so a cycle can never masquerade as a root); every node with at
    least one root ancestor reports (node, depth = max hops to any root,
    n_roots = distinct root ancestors), and roots themselves report
    (root, 0, 0). Nodes trapped in root-less cycles are absent by
    construction — the closure cap already bounds them (documented, same
    rationale as taxonomy_closure's max_hops).

    Scale shape: two bounded aggregates over the closure table
    (vocabulary-sized, never corpus-sized) and one anti-join for the
    root set; the depth aggregate map-side combines on the node key."""
    hypos = closure.select("hypo").distinct()
    roots = (
        closure.select(F.col("hyper").alias("node"))
        .distinct()
        .join(hypos.withColumnRenamed("hypo", "node"), "node", "left_anti")
    )
    depths = (
        closure.join(roots.withColumnRenamed("node", "hyper"), "hyper")
        .groupBy("hypo")
        .agg(
            F.max("hops").cast("long").alias("depth"),
            F.countDistinct("hyper").cast("long").alias("n_roots"),
        )
        .withColumnRenamed("hypo", "node")
    )
    return depths.unionByName(
        roots.select(
            "node",
            F.lit(0).cast("long").alias("depth"),
            F.lit(0).cast("long").alias("n_roots"),
        )
    )


# Schwartz-Hearst-style acronym definition: a TitleCase token run
# immediately followed by a parenthesized 2-6-letter uppercase candidate.
# Same Java-regex / RE2 agreement subset as the patterns above; the
# DuckDB oracle imports this exact string.
ACRO_PAT = r"((?:[A-Z][a-z0-9]+ )+)\(([A-Z]{2,6})\)"


def acronym_pairs(sentences: DataFrame) -> DataFrame:
    """sentences(url, sent_idx, sent) -> (acro, long_norm, n_sents,
    n_docs): corpus-aggregated acronym definitions in the deterministic
    initialism subset of Schwartz & Hearst (JAMIA 2003 / PSB 2003): a
    candidate is a TitleCase word run directly before "(ACRO)" (first
    match per sentence — ``regexp_extract`` semantics, identical in both
    engines), VALIDATED by requiring the initials of the last
    ``len(ACRO)`` long-form words to spell the acronym exactly (the
    original algorithm's left-extension search collapsed to its
    initialism core so both engines replay it closed-form; candidates
    whose initials mismatch — e.g. a parenthesized ticker or citation —
    are dropped, and the long form is TRIMMED to exactly those matched
    words before normalization). The (acronym -> expansion) table is the
    alias bootstrap ER consumes next to anchor texts.

    Scale shape: one narrow regexp scan over sentences plus pure
    array expressions (split / slice / initial-fold — no join, no UDF),
    then one map-side-combining aggregate keyed on the bounded
    (acro, long_norm) vocabulary. A hot definition is one reducer key;
    nothing is corpus-quadratic."""
    cand = sentences.select(
        "url",
        F.trim(F.regexp_extract("sent", ACRO_PAT, 1)).alias("lf"),
        F.regexp_extract("sent", ACRO_PAT, 2).alias("acro"),
    ).filter(F.length("acro") > 0)
    words = F.split(F.col("lf"), " ")
    n = F.length("acro")
    initials = F.when(
        F.size(words) >= n,
        F.concat_ws(
            "",
            F.transform(
                F.slice(words, n * -1, n),
                lambda w: F.upper(F.substring(w, 1, 1)),
            ),
        ),
    )
    long_norm = F.lower(F.concat_ws(" ", F.slice(words, n * -1, n)))
    valid = cand.filter(initials == F.col("acro")).select(
        "url", "acro", long_norm.alias("long_norm")
    )
    return valid.groupBy("acro", "long_norm").agg(
        F.count("*").cast("long").alias("n_sents"),
        F.countDistinct("url").cast("long").alias("n_docs"),
    )


def taxonomy_lca(closure: DataFrame, max_desc: int | None = None) -> DataFrame:
    """Lowest common ancestor per unordered pair of co-subsumed concepts
    over the (capped) is-a closure — the ontology similarity primitive
    (Wu-Palmer / Resnik similarity and type-generalization both start
    from the LCA): for every pair (node_a < node_b) sharing at least one
    STRICT common ancestor, the ancestor minimizing the deterministic
    total order (max(hops_a, hops_b), hops_a + hops_b, ancestor key) —
    the closest ancestor by worst-side distance, ties to the balanced
    one, then lexicographic. Output: (node_a, node_b, lca, hops_a,
    hops_b).

    ``max_desc``: per-ancestor descendant cap, default the shared
    adaptive rule clamp(icbrt_ceil(N_concepts), 50, 5000). Pairing
    through an ancestor is quadratic in its descendant set and a
    near-root subsumes EVERYTHING — the classic pairing trap the LSH
    bucket cap exists for — so ancestors above the cap are excluded
    from pairing: when a lower common ancestor exists it always beats a
    capped general on the (max, sum) order anyway; pairs whose ONLY
    common ancestors are capped generals drop (the df-capped-channel
    precedent — the cap is part of the operator's semantics and the
    oracle replays it from count(*)).

    Scale shape: descendant counts are one map-side-combining aggregate
    on the ancestor key; the pair product is an equi-join on the
    ancestor restricted to capped ancestors (bounded fan-out by
    construction); argmin is a (pair)-keyed min aggregate over an
    exact-integer packed score (hops <= closure cap, so the pack never
    overflows) + an equal-score min(anc) tie-break + one join back for
    the winner's hop columns — no window over the pair set."""
    from unsupervised_ner_spark.caching import scoped_persist
    from unsupervised_ner_spark.ops.dedup import icbrt_ceil

    if max_desc is None:
        n_concepts = (
            closure.select(F.col("hypo").alias("k"))
            .unionAll(closure.select(F.col("hyper").alias("k")))
            .distinct()
            .count()
        )
        max_desc = min(max(icbrt_ceil(n_concepts), 50), 5000)
    kept = (
        closure.groupBy("hyper")
        .agg(F.count("*").alias("n_desc"))
        .filter(F.col("n_desc") <= int(max_desc))
        .select("hyper")
    )
    a = closure.join(kept, "hyper").select("hypo", "hyper", "hops")
    x = a.select(
        F.col("hypo").alias("node_a"), F.col("hyper").alias("anc"),
        F.col("hops").alias("hops_a"),
    )
    y = a.select(
        F.col("hypo").alias("node_b"), F.col("hyper").alias("anc"),
        F.col("hops").alias("hops_b"),
    )
    pairs = x.join(y, "anc").filter(F.col("node_a") < F.col("node_b"))
    scored = pairs.select(
        "node_a", "node_b", "anc", "hops_a", "hops_b",
        (
            F.greatest("hops_a", "hops_b") * F.lit(1_048_576)
            + F.col("hops_a") + F.col("hops_b")
        ).cast("long").alias("score"),
    )
    scored = scoped_persist(scored)
    best = scored.groupBy("node_a", "node_b").agg(
        F.min("score").alias("score")
    )
    lca = (
        scored.join(best, ["node_a", "node_b", "score"])
        .groupBy("node_a", "node_b")
        .agg(F.min("anc").alias("lca"))
    )
    return lca.join(
        scored.select("node_a", "node_b",
                      F.col("anc").alias("lca"), "hops_a", "hops_b"),
        ["node_a", "node_b", "lca"],
    ).select("node_a", "node_b", "lca", "hops_a", "hops_b")


NEG_ISA_PAT = (
    "([A-Z][A-Za-z0-9]*(?: [A-Z][A-Za-z0-9]*)*)"
    " is not (?:a|an) ([a-z][a-z0-9]*)"
)


def isa_polarity(sentences: DataFrame) -> DataFrame:
    """Polarity-aware is-a mining — the contradiction layer over the
    Hearst extractor: negated assertions ("X is not a Y") are first-
    class KG signal (hard negatives for type classifiers, and direct
    contradictions of asserted hypernym edges — the curator queue).
    Per (hypo, hyper): positive support (both Hearst patterns summed),
    negative support, and the verdict 'contradicted' (both polarities
    observed) / 'positive_only' / 'negative_only'.

    The NEG pattern cannot fire on positives (the is-a regex requires
    " is a/an" immediately after the copula — "is not a" breaks it) and
    vice versa, so the two extractions are disjoint by construction.

    Scale shape: two independent narrow regex scans (same plan family
    as hearst_hypernyms), each collapsing to the vocabulary-sized edge
    table before the FULL OUTER join — the join never sees a corpus-
    sized side."""
    pos = (
        hearst_hypernyms(sentences)
        .groupBy("hypo", "hyper")
        .agg(F.sum("n_sents").cast("long").alias("n_pos"))
    )
    neg = (
        sentences.select(
            "url",
            F.lower(F.regexp_extract("sent", NEG_ISA_PAT, 1)).alias("hypo"),
            F.regexp_extract("sent", NEG_ISA_PAT, 2).alias("hyper"),
        )
        .filter((F.length("hypo") > 0) & (F.length("hyper") > 0))
        .groupBy("hypo", "hyper")
        .agg(F.count("*").cast("long").alias("n_neg"))
    )
    return (
        pos.join(neg, ["hypo", "hyper"], "full_outer")
        .select(
            "hypo", "hyper",
            F.coalesce("n_pos", F.lit(0)).cast("long").alias("n_pos"),
            F.coalesce("n_neg", F.lit(0)).cast("long").alias("n_neg"),
        )
        .select(
            "hypo", "hyper", "n_pos", "n_neg",
            F.when(
                (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                F.lit("contradicted"),
            )
            .when(F.col("n_pos") > 0, F.lit("positive_only"))
            .otherwise(F.lit("negative_only")).alias("verdict"),
        )
    )


POS_WORDS = ["great", "excellent", "wonderful", "amazing", "good"]
NEG_WORDS = ["terrible", "awful", "poor", "bad", "horrible"]
ENTITY_TOKEN_PAT = "[A-Z][A-Za-z0-9]*"


def entity_sentiment(sentences: DataFrame) -> DataFrame:
    """Lexicon-vote entity sentiment association — the KG enrichment
    that attaches an opinion profile to every surfaced entity (aspect
    sentiment's corpus-level aggregate): per capitalized surface, the
    summed positive / negative lexicon hits of the sentences it appears
    in, the mention count, and the verdict positive / negative / mixed
    / neutral. The lexicons are small fixed public word lists (the
    Benford-constants device: no model, both engines share the
    literals); a sentence's DISTINCT surfaces each receive its hits
    once (array_distinct before the explode — no double credit for a
    repeated name).

    Scale shape: one narrow regex/token map per sentence, one surface
    explode (bounded by capitalized tokens per sentence), ONE map-side-
    combining aggregate onto the surface vocabulary. No join."""
    toks_low = F.transform(
        F.split(F.col("sent"), r"\s+"), F.lower
    )
    n_pos = F.size(F.filter(toks_low, lambda t: t.isin(*POS_WORDS)))
    n_neg = F.size(F.filter(toks_low, lambda t: t.isin(*NEG_WORDS)))
    surfaces = F.array_distinct(
        F.expr(f"regexp_extract_all(sent, '{ENTITY_TOKEN_PAT}', 0)")
    )
    exploded = sentences.select(
        n_pos.alias("n_pos"), n_neg.alias("n_neg"),
        F.explode(surfaces).alias("surface"),
    )
    agg = exploded.groupBy("surface").agg(
        F.count("*").cast("long").alias("n_mentions"),
        F.sum("n_pos").cast("long").alias("n_pos_hits"),
        F.sum("n_neg").cast("long").alias("n_neg_hits"),
    )
    return agg.select(
        "surface", "n_mentions", "n_pos_hits", "n_neg_hits",
        F.when(
            (F.col("n_pos_hits") > 0) & (F.col("n_neg_hits") > 0),
            F.lit("mixed"),
        )
        .when(F.col("n_pos_hits") > 0, F.lit("positive"))
        .when(F.col("n_neg_hits") > 0, F.lit("negative"))
        .otherwise(F.lit("neutral")).alias("verdict"),
    )
