"""KG-embedding training-data operators: deterministic negative sampling
over the triple table and masked entity-context windows over typed
mentions — the two tables a TransE/DistMult-style trainer (or an
entity-aware MLM) consumes.

Both are hash-gate-friendly by construction: every "random" choice is an
md5-derived integer both engines compute identically, and every output
column is a string or BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from unsupervised_ner_spark.caching import scoped_persist

ENT_BUCKET_HEX = 2  # 256 index buckets; raise to 3/4 at larger vocab


def md5_int32(col) -> F.Column:
    """First 8 hex chars of md5 as a non-negative BIGINT in [0, 2^32) —
    the engine/oracle-shared uniform hash for modular selection (the
    DuckDB twin is oracle_sql._hex8_int_sql, nibble-exact arithmetic)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def entity_index(triples: DataFrame) -> DataFrame:
    """Dense 0-based index over the DISTINCT entity vocabulary (subjects
    union objects), in the deterministic (md5(ent), ent) order.

    Scale shape: the global index is the TWO-LEVEL rank (ops/packing.py
    precedent) — per-md5-bucket row_number (256 concurrent in-bucket
    sorts, each 1/256th of the vocab) plus an exclusive prefix sum over
    the 256-row bucket-count table broadcast back — because the naive
    one-window global row_number is a single-partition sort of the whole
    vocabulary. Since the bucket is a prefix of the md5, (bucket, h, ent)
    order == (h, ent) order, which is exactly the flat row_number the
    DuckDB oracle runs at test scale."""
    ents = (
        triples.select(F.col("subj").alias("ent"))
        .unionByName(triples.select(F.col("obj").alias("ent")))
        .distinct()
    )
    h = F.md5("ent")
    base = ents.select(
        "ent", h.alias("h"), F.substring(h, 1, ENT_BUCKET_HEX).alias("bucket")
    )
    w_in = Window.partitionBy("bucket").orderBy("h", "ent")
    local = base.withColumn("rn", F.row_number().over(w_in).cast("long"))
    counts = base.groupBy("bucket").agg(F.count("*").cast("long").alias("n"))
    w_b = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = counts.select(
        "bucket", (F.sum("n").over(w_b) - F.col("n")).cast("long").alias("b_off")
    )
    return local.join(F.broadcast(offsets), "bucket").select(
        "ent", (F.col("b_off") + F.col("rn") - 1).cast("long").alias("ent_idx")
    )


def negative_samples(triples: DataFrame, k: int = 2) -> DataFrame:
    """Deterministic tail-corruption negatives: for each DISTINCT
    (subj, subj_type, pred_norm, obj, obj_type) triple and each
    neg_k in 1..k, replace the object with the vocabulary entity at
    index md5_int32(subj|pred_norm|obj|neg_k) mod |vocab|.

    Returns (subj, subj_type, pred_norm, obj, obj_type, neg_k, neg_obj,
    hits_true) — ``hits_true`` flags the standard false-negative case
    (the draw landed on the true object); trainers filter or re-draw,
    and keeping it as a column keeps the gate exact instead of hiding
    the collision policy.

    Scale shape: the vocab index is persisted once (it feeds the 1-row
    count and the selection join); the expansion is a narrow k-fold
    explode of the distinct-triple table; the selection is an equi-join
    on ent_idx between two vocabulary-bounded tables; |vocab| joins in
    as a broadcast single row. Nothing scans the corpus twice and no
    global sort over the vocabulary exists (see entity_index)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    idx = scoped_persist(entity_index(triples))
    n_ents = idx.groupBy().agg(F.count("*").cast("long").alias("n_ents"))
    dtrip = triples.select(
        "subj", "subj_type", "pred_norm", "obj", "obj_type"
    ).distinct()
    expanded = dtrip.select(
        "*", F.explode(F.sequence(F.lit(1), F.lit(k))).alias("neg_k")
    ).withColumn("neg_k", F.col("neg_k").cast("long"))
    pick = F.pmod(
        md5_int32(
            F.concat_ws(
                "|", "subj", "pred_norm", "obj", F.col("neg_k").cast("string")
            )
        ),
        F.col("n_ents"),
    ).alias("pick")
    sel = expanded.crossJoin(F.broadcast(n_ents)).select("*", pick)
    return sel.join(idx, sel["pick"] == idx["ent_idx"]).select(
        "subj",
        "subj_type",
        "pred_norm",
        "obj",
        "obj_type",
        "neg_k",
        F.col("ent").alias("neg_obj"),
        (F.col("ent") == F.col("obj")).cast("long").alias("hits_true"),
    )


def entity_contexts(
    typed: DataFrame, sentences: DataFrame, window: int = 3
) -> DataFrame:
    """Per typed mention: the +-``window``-token context with the mention
    span replaced by ``[MASK]`` — the entity-aware-MLM / embedding
    training row (and the distributed form of the reference's per-mention
    masked-probe input construction, batched_main_NER.py:425-437, built
    from the ALREADY-TYPED mention table instead of re-probing).

    Tokenization matches the engine's token chain exactly (whitespace
    split, empties dropped, ``:__entity__`` markers stripped), so
    begin_tok/end_tok index directly into the word array.

    Returns (url, sent_idx, mention_idx, surface, etype, begin_tok,
    end_tok, left_ctx, right_ctx, masked).

    Scale shape: one co-partitioned equi-join of mentions onto their
    sentences on (url, sent_idx) — sentence-local, never corpus-
    quadratic — then pure narrow array arithmetic; no window functions,
    no aggregation."""
    toks = F.filter(F.split(F.col("sent"), r"\s+"), lambda t: t != F.lit(""))
    words = F.transform(toks, lambda t: F.regexp_replace(t, ":__entity__", ""))
    sents = sentences.select("url", "sent_idx", words.alias("words"))
    j = typed.select(
        "url", "sent_idx", "mention_idx", "begin_tok", "end_tok", "surface",
        F.col("pred_group").alias("etype"),
    ).join(sents, ["url", "sent_idx"])

    b, e = F.col("begin_tok"), F.col("end_tok")
    n = F.size("words")
    start_l = F.greatest(b + 1 - window, F.lit(1))
    left = F.slice("words", start_l, b + 1 - start_l)
    len_r = F.greatest(F.least(F.lit(window), n - (e + 1)), F.lit(0))
    right = F.slice("words", e + 2, len_r)
    masked = F.array_join(
        F.concat(left, F.array(F.lit("[MASK]")), right), " "
    )
    return j.select(
        "url",
        F.col("sent_idx").cast("long").alias("sent_idx"),
        F.col("mention_idx").cast("long").alias("mention_idx"),
        "surface",
        "etype",
        b.cast("long").alias("begin_tok"),
        e.cast("long").alias("end_tok"),
        F.array_join(left, " ").alias("left_ctx"),
        F.array_join(right, " ").alias("right_ctx"),
        masked.alias("masked"),
    )


def tagger_agreement(tags_a: DataFrame, tags_b: DataFrame) -> DataFrame:
    """Token-level inter-tagger agreement between two BIO tag tables keyed
    (url, sent_idx, token_idx): the confusion matrix plus the integer
    sufficient statistics for Cohen's kappa. The reference runs TWO models
    and adjudicates per mention (aggregate_server.py precedence rules);
    this is the corpus-level dashboard of HOW MUCH they disagree and
    where — the evidence that justifies (or retires) the ensemble.

    Output: one row per observed (tag_a, tag_b) pair with n_pair, the row
    marginal n_a (tokens model A gave tag_a), column marginal n_b, and
    n_total — kappa = (sum(diag)/n - sum(n_a*n_b)/n^2) / (1 - ...) is a
    derived float, deliberately not emitted (the NPMI precedent: integers
    only leave the operator).

    Scale shape: ONE co-partitioned inner equi-join on the token key
    (both sides arrive partitioned by url from their tagging passes) +
    ONE map-side-combining aggregate; the marginal windows run over the
    ALREADY AGGREGATED confusion matrix — bounded by |tagset|^2 (~35^2),
    a constant, so the single-partition window is a non-issue at any
    corpus size."""
    from pyspark.sql import Window

    a = tags_a.select("url", "sent_idx", "token_idx", F.col("tag").alias("tag_a"))
    b = tags_b.select("url", "sent_idx", "token_idx", F.col("tag").alias("tag_b"))
    conf = (
        a.join(b, ["url", "sent_idx", "token_idx"])
        .groupBy("tag_a", "tag_b")
        .agg(F.count("*").cast("long").alias("n_pair"))
    )
    wa = Window.partitionBy("tag_a")
    wb = Window.partitionBy("tag_b")
    wt = Window.partitionBy()
    return conf.select(
        "tag_a", "tag_b", "n_pair",
        F.sum("n_pair").over(wa).cast("long").alias("n_a"),
        F.sum("n_pair").over(wb).cast("long").alias("n_b"),
        F.sum("n_pair").over(wt).cast("long").alias("n_total"),
    )


def triple_dataset(triples: DataFrame, k: int = 2) -> DataFrame:
    """Labeled triple-classification dataset — the composed "train a KG
    scorer" product the individual pieces exist for: DISTINCT positives
    (label 1) + tail-corruption negatives (label 0, the standard
    false-negative ``hits_true`` draws excluded), with a deterministic
    HEAD-LEVEL hash split: the split key is (subj | pred_norm), so a fact
    and every corruption of it land in the same split by construction —
    the triple-level leakage channel (same (s,p) in train and test with
    different tails) is closed the same way split_assign closes the
    same-source document channel. Negative rows keep the ORIGINAL
    obj_type (type-constrained corruption, the standard TransE protocol);
    ``neg_k`` is 0 on positives.

    Scale shape: inherited from the parts — negatives are the
    vocabulary-bounded equi-join chain of negative_samples, positives one
    distinct; the split is a stateless projection (no shuffle); the union
    is column-aligned, no join added."""
    from unsupervised_ner_spark.caching import scoped_persist
    from unsupervised_ner_spark.ops.sampling import (
        SPLIT_TRAIN_BUCKETS,
        SPLIT_VAL_BUCKETS,
        _bucket_col,
    )

    # the distinct fact table feeds the positive side AND the whole
    # negative chain (vocab index + corruption expansion) — persist once
    # so the corpus-scanning triple chain above runs exactly once
    dtrip = scoped_persist(
        triples.select(
            "subj", "subj_type", "pred_norm", "obj", "obj_type"
        ).distinct()
    )
    pos = dtrip.select(
        "*",
        F.lit(1).cast("long").alias("label"),
        F.lit(0).cast("long").alias("neg_k"),
    )
    neg = (
        negative_samples(dtrip, k=k)
        .filter(F.col("hits_true") == 0)
        .select(
            "subj", "subj_type", "pred_norm",
            F.col("neg_obj").alias("obj"), "obj_type",
            F.lit(0).cast("long").alias("label"),
            "neg_k",
        )
    )
    b = _bucket_col(F.concat_ws("|", "subj", "pred_norm"))
    split = (
        F.when(b < F.lit(f"{SPLIT_TRAIN_BUCKETS:03x}"), F.lit("train"))
        .when(b < F.lit(f"{SPLIT_VAL_BUCKETS:03x}"), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return pos.unionByName(neg).select("*", split.alias("split"))


def _hash_emb_term(prefix: str, col, i: int, mod: int) -> F.Column:
    """Dimension ``i`` of the deterministic hash embedding: md5_int32 of
    'prefix#value#i' mod ``mod`` — the engine/oracle-shared stand-in for
    trained KGE weights (torch is absent from this container; a real
    embedding table would join in by key and the protocol below is
    unchanged)."""
    return (
        md5_int32(F.concat_ws("#", F.lit(prefix), col, F.lit(str(i))))
        % F.lit(int(mod))
    ).cast("long")


def kge_eval(
    triples: DataFrame, dim: int = 4, emb_mod: int = 1000,
    score_fn: str = "transe",
) -> DataFrame:
    """TransE link-prediction evaluation harness (Bordes et al. 2013,
    the standard filtered-ranking protocol): for every DISTINCT test
    triple (s, p, o), rank the true object o among all type-compatible
    candidate entities c by the integer L1 score
    ``sum_i |emb_s[i] + emb_p[i] - emb_c[i]|``, with known true triples
    (s, p, c') filtered OUT of the candidate list (the "filtered"
    setting that removes false negatives). Embeddings are deterministic
    hash vectors (_hash_emb_term) so the harness is hash-gateable
    end-to-end; swap in a trained table and the ranks become the real
    MR/Hits@k. Ties break on the candidate key (score asc, ent asc) —
    a total order both engines replay.

    Returns per-predicate sufficient statistics: (pred_norm, n_test,
    n_cands, sum_rank, hits1, hits3, hits10) — MR = sum_rank/n_test and
    Hits@k = hitsk/n_test are downstream float derivations that never
    enter the hashed surface (the NPMI precedent).

    Scale shape: the candidate join is type-blocked (test triples x
    same-type vocabulary — the eval protocol's inherent O(T x E_type)
    cost; every published KGE eval pays it) with the vocabulary bounded
    by distinct entities, broadcast when small. The ranking window
    partitions per test triple — bounded by the type's vocabulary size,
    never corpus-sized. At 100 TB the standard mitigations compose
    unchanged: shard the vocabulary and take per-shard top-k before
    ranking, or hash-sample candidates (sampled MRR), both upstream of
    the same window.

    ``score_fn`` selects the model family, everything else identical:
    "transe" (translational, L1 distance ASC), "distmult" (bilinear
    Yang et al. 2015, ``sum_i emb_s[i] * emb_r[i] * emb_c[i]`` DESC —
    ranked via its negation so one ascending window serves all
    families), or "complex" (Trouillon et al. 2016 — complex-valued
    bilinear form, the asymmetric-relation family; see the branch).
    Overflow: per-dim product < emb_mod^3 = 1e9, summed over dim << a
    long."""
    dtrip = scoped_persist(
        triples.select("subj", "subj_type", "pred_norm", "obj", "obj_type")
        .distinct()
    )
    vocab = scoped_persist(
        dtrip.select(F.col("subj").alias("ent"), F.col("subj_type").alias("etype"))
        .unionByName(
            dtrip.select(F.col("obj").alias("ent"), F.col("obj_type").alias("etype"))
        )
        .distinct()
    )
    cand = dtrip.join(
        vocab.select(F.col("ent").alias("c"), F.col("etype").alias("obj_type")),
        "obj_type",
    )
    truth = dtrip.select(
        "subj", "subj_type", "pred_norm",
        F.col("obj").alias("c"), "obj_type",
        F.lit(1).cast("long").alias("is_true"),
    ).distinct()
    cand = cand.join(
        truth, ["subj", "subj_type", "pred_norm", "c", "obj_type"], "left"
    ).filter(F.col("is_true").isNull() | (F.col("c") == F.col("obj")))
    if score_fn == "transe":
        dist = sum(
            F.abs(
                _hash_emb_term("e", F.col("subj"), i, emb_mod)
                + _hash_emb_term("r", F.col("pred_norm"), i, emb_mod)
                - _hash_emb_term("e", F.col("c"), i, emb_mod)
            )
            for i in range(int(dim))
        ).cast("long")
    elif score_fn == "distmult":
        dist = (
            -sum(
                _hash_emb_term("e", F.col("subj"), i, emb_mod)
                * _hash_emb_term("r", F.col("pred_norm"), i, emb_mod)
                * _hash_emb_term("e", F.col("c"), i, emb_mod)
                for i in range(int(dim))
            )
        ).cast("long")
    elif score_fn == "complex":
        # ComplEx (Trouillon et al. 2016): Re(<w_r, e_s, conj(e_o)>) =
        # sum_i rr*(sr*or + si*oi) + ri*(sr*oi - si*or), with separate
        # real/imag hash embeddings ("er"/"ei" entities, "rr"/"ri"
        # relations); ranked DESC via negation like DistMult. The
        # imaginary relation part makes the score ASYMMETRIC in (s, o) —
        # the family's point: it can model directional predicates
        # DistMult provably cannot. Overflow: 2 products of three
        # < emb_mod^3 per dim, summed over dim << a long.
        def _cx(i: int, a: str, b: str, col_a, col_b):
            return (
                _hash_emb_term(a, col_a, i, emb_mod)
                * _hash_emb_term(b, col_b, i, emb_mod)
            )

        s, p, c = F.col("subj"), F.col("pred_norm"), F.col("c")
        dist = (
            -sum(
                _hash_emb_term("rr", p, i, emb_mod)
                * (
                    _cx(i, "er", "er", s, c)
                    + _cx(i, "ei", "ei", s, c)
                )
                + _hash_emb_term("ri", p, i, emb_mod)
                * (
                    _cx(i, "er", "ei", s, c)
                    - _cx(i, "ei", "er", s, c)
                )
                for i in range(int(dim))
            )
        ).cast("long")
    else:  # pragma: no cover - guarded by the three callers
        raise ValueError(f"unknown score_fn: {score_fn}")
    w = Window.partitionBy(
        "subj", "subj_type", "pred_norm", "obj", "obj_type"
    ).orderBy(F.asc("dist"), F.asc("c"))
    ranked = (
        cand.withColumn("dist", dist)
        .withColumn("rank", F.row_number().over(w).cast("long"))
    )
    per_triple = ranked.groupBy(
        "subj", "subj_type", "pred_norm", "obj", "obj_type"
    ).agg(
        F.count("*").cast("long").alias("n_cands"),
        F.min(F.when(F.col("c") == F.col("obj"), F.col("rank")))
        .cast("long").alias("rank"),
    )
    return per_triple.groupBy("pred_norm").agg(
        F.count("*").cast("long").alias("n_test"),
        F.sum("n_cands").cast("long").alias("n_cands"),
        F.sum("rank").cast("long").alias("sum_rank"),
        F.sum((F.col("rank") <= 1).cast("long")).cast("long").alias("hits1"),
        F.sum((F.col("rank") <= 3).cast("long")).cast("long").alias("hits3"),
        F.sum((F.col("rank") <= 10).cast("long")).cast("long").alias("hits10"),
    )
