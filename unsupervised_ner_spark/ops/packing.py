"""Sequence packing — assign every document a contiguous token-offset
range in a deterministic corpus order and derive which fixed-length
training sequences ("packs") it lands in. This is the concat-and-cut
packing LLM pretraining uses: the token stream is conceptually one long
array cut every ``seq_len`` tokens; a document overlapping a cut spans
two (or more) packs.

The whole operator is a DISTRIBUTED PREFIX SUM, the textbook two-level
form, because the naive expression — one global cumulative-sum window —
is a single-partition sort that cannot scale past one machine:

1. every doc gets a deterministic md5 bucket (``bucket_hex`` hex chars,
   default 256 buckets) and a deterministic in-bucket order
   (md5(doc_id), doc_id);
2. the within-bucket cumulative token sum is one window PARTITIONED BY
   bucket (a real shuffle, but 256+ concurrent sorts, each 1/256th of
   the corpus — raise ``bucket_hex`` to 3/4 at larger scale and the
   per-partition sort shrinks geometrically while step 3 stays tiny);
3. per-bucket token totals (a ``2^(4*bucket_hex)``-row table) take an
   EXCLUSIVE prefix sum over bucket order — a window over a bounded
   table — and broadcast-join back as each bucket's base offset.

All arithmetic is BIGINT (token counts, offsets, integer ``div``), so
the Spark plan and the DuckDB oracle (one flat global cumsum — affordable
at test scale, same order key) agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from unsupervised_ner_spark.ops.textstats import tokens_ws


def pack_sequences(
    documents: DataFrame, seq_len: int = 512, bucket_hex: int = 2
) -> DataFrame:
    """documents(doc_id, text, ...) -> one row per NON-EMPTY doc:
    (doc_id, n_tok, offset, pack_first, pack_last, n_packs).

    ``offset`` is the doc's exclusive start in the global token stream
    under the (bucket, md5(doc_id), doc_id) order; packs are the
    ``seq_len``-token windows [p*seq_len, (p+1)*seq_len). Empty docs are
    dropped (they occupy no tokens and would alias their neighbor's
    offset)."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    if not 1 <= bucket_hex <= 8:
        raise ValueError("bucket_hex must be in [1, 8]")

    md5_id = F.md5(F.col("doc_id").cast("string"))
    base = documents.select(
        "doc_id",
        F.size(tokens_ws(F.col("text"))).cast("long").alias("n_tok"),
        F.substring(md5_id, 1, bucket_hex).alias("bucket"),
        md5_id.alias("h"),
    ).filter(F.col("n_tok") > 0)

    w_in = (
        Window.partitionBy("bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = base.select(
        "doc_id",
        "n_tok",
        "bucket",
        (F.sum("n_tok").over(w_in) - F.col("n_tok")).cast("long").alias("off_in"),
    )

    totals = base.groupBy("bucket").agg(F.sum("n_tok").cast("long").alias("b_tok"))
    w_b = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # bounded table (2^(4*bucket_hex) rows): the only global-ordered window,
    # and it sorts buckets, never documents
    offsets = totals.select(
        "bucket",
        (F.sum("b_tok").over(w_b) - F.col("b_tok")).cast("long").alias("b_off"),
    )

    return (
        cum.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "n_tok",
            (F.col("b_off") + F.col("off_in")).alias("tok_offset"),
        )
        .select(
            "doc_id",
            "n_tok",
            "tok_offset",
            F.expr(f"tok_offset div {seq_len}").alias("pack_first"),
            F.expr(f"(tok_offset + n_tok - 1) div {seq_len}").alias("pack_last"),
        )
        .withColumn("n_packs", F.col("pack_last") - F.col("pack_first") + F.lit(1))
    )


def pack_stats(packed: DataFrame, seq_len: int = 512) -> DataFrame:
    """Packing efficiency summary over pack_sequences output: per-corpus
    totals (docs, tokens, packs touched, docs that straddle a cut) — a
    1-row bounded aggregate. ``n_seqs`` is the number of packs the stream
    fills (ceiling of total tokens / seq_len); ``n_straddlers`` counts
    docs split across a pack boundary (the cross-doc attention-mask cost
    of concat-and-cut packing)."""
    return packed.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.expr(f"(sum(n_tok) + {seq_len} - 1) div {seq_len}")
        .cast("long")
        .alias("n_seqs"),
        F.sum((F.col("n_packs") > 1).cast("long")).cast("long").alias("n_straddlers"),
    )


def chunk_tokens(
    documents: DataFrame, chunk_len: int = 64, stride: int = 48
) -> DataFrame:
    """Overlapping token-window chunking — the RAG / long-context prep
    primitive: each non-empty doc yields windows of ``chunk_len`` tokens
    starting every ``stride`` tokens, the final window clipped to the doc
    end (and guaranteed to cover the tail: the last start is the smallest
    multiple of stride with start + chunk_len >= n). Emits
    (doc_id, chunk_idx, start_tok, n_tok_chunk, chunk_text).

    Scale shape: a pure narrow transform — tokenize, compute the window
    count with integer arithmetic, explode a bounded per-doc sequence,
    slice the token array per window. No exchange anywhere: chunking
    parallelizes perfectly with the scan at any corpus size."""
    if chunk_len <= 0 or stride <= 0 or stride > chunk_len:
        raise ValueError("need 0 < stride <= chunk_len")
    from unsupervised_ner_spark.ops.textstats import tokens_ws

    toks = tokens_ws(F.col("text"))
    n = F.size(toks).cast("long")
    k_last = F.when(F.col("size_n") <= chunk_len, F.lit(0).cast("long")).otherwise(
        F.expr(f"(size_n - {chunk_len} + {stride} - 1) div {stride}")
    )
    base = documents.select(
        "doc_id", toks.alias("toks"), n.alias("size_n")
    ).filter(F.col("size_n") > 0)
    return (
        base.withColumn("k_last", k_last)
        .select(
            "doc_id",
            "toks",
            "size_n",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("k_last"))).alias(
                "chunk_idx"
            ),
        )
        .select(
            "doc_id",
            "chunk_idx",
            (F.col("chunk_idx") * stride).alias("start_tok"),
            F.least(
                F.lit(chunk_len).cast("long"),
                F.col("size_n") - F.col("chunk_idx") * stride,
            ).alias("n_tok_chunk"),
            F.array_join(
                F.slice(
                    F.col("toks"),
                    (F.col("chunk_idx") * stride + 1).cast("int"),
                    F.least(
                        F.lit(chunk_len).cast("long"),
                        F.col("size_n") - F.col("chunk_idx") * stride,
                    ).cast("int"),
                ),
                " ",
            ).alias("chunk_text"),
        )
    )


def pack_manifest(packed: DataFrame, seq_len: int = 512) -> DataFrame:
    """The writer-side packing table: one row per (pack, doc) overlap —
    which slice of which document fills which positions of which training
    sequence. This is what a sequence-writer job actually consumes; a
    doc spanning several packs appears once per pack with the intersection
    arithmetic done here:

      (pack_id, doc_id, pos_in_pack, start_tok, n_tok_in_pack)

    pos_in_pack = where the slice starts inside the pack, start_tok =
    where it starts inside the doc. Input is pack_sequences(...) output
    computed with the SAME seq_len.

    Scale shape: one narrow explode over the bounded per-doc pack span
    (a doc overlaps ceil(n_tok/seq_len)+1 packs at most) — no exchange
    beyond what pack_sequences already did."""
    lo = F.greatest(F.col("tok_offset"), F.col("pack_id") * seq_len)
    hi = F.least(
        F.col("tok_offset") + F.col("n_tok"), (F.col("pack_id") + 1) * seq_len
    )
    return (
        packed.select(
            "doc_id",
            "n_tok",
            "tok_offset",
            F.explode(F.sequence("pack_first", "pack_last")).alias("pack_id"),
        )
        .select(
            "pack_id",
            "doc_id",
            (lo - F.col("pack_id") * seq_len).alias("pos_in_pack"),
            (lo - F.col("tok_offset")).alias("start_tok"),
            (hi - lo).alias("n_tok_in_pack"),
        )
    )


def span_corruption(
    documents: DataFrame, noise_pct: int = 15
) -> DataFrame:
    """T5-style span-corruption statistics (Raffel et al. JMLR'20 §3.1.4)
    — the denoising-objective prep a seq2seq pretraining pipeline runs
    over every document: ~``noise_pct``% of token positions are drawn as
    noise by the deterministic hash ``md5(doc_id:pos) % 100 < pct`` (the
    engine/oracle-shared uniform draw — a seeded RNG both sides replay),
    CONSECUTIVE noisy positions merge into one corrupted span, each span
    is replaced by one sentinel in the encoder input and emitted as
    (sentinel + tokens) in the decoder target. Output per non-empty doc:
    n_tok, n_noise, n_spans, and the exact T5 lengths
    input_len = n_tok - n_noise + n_spans,
    target_len = n_noise + n_spans + 1 (the closing sentinel).

    Scale shape: one token-position explode (narrow, page-spread), one
    per-doc window over the NOISY positions only (lag marks span starts
    — partition bounded by the doc's noise count), and one
    map-side-combining per-doc aggregate. No join."""
    from pyspark.sql import Window

    from unsupervised_ner_spark.ops.textstats import tokens_ws

    base = documents.select(
        "doc_id",
        F.size(tokens_ws(F.col("text"))).cast("long").alias("n_tok"),
    ).filter(F.col("n_tok") > 0)
    pos = base.select(
        "doc_id", "n_tok",
        F.explode(F.sequence(F.lit(0), F.col("n_tok") - 1)).alias("pos"),
    )
    draw = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"), F.lit(":"),
                    F.col("pos").cast("string"),
                )
            ),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    noisy = pos.filter(draw % 100 < int(noise_pct))
    wd = Window.partitionBy("doc_id").orderBy("pos")
    spans = noisy.select(
        "doc_id", "n_tok", "pos",
        F.when(
            F.lag("pos").over(wd).isNull()
            | (F.col("pos") - F.lag("pos").over(wd) > 1),
            F.lit(1),
        ).otherwise(F.lit(0)).cast("long").alias("new_span"),
    )
    per_doc = spans.groupBy("doc_id", "n_tok").agg(
        F.count("*").cast("long").alias("n_noise"),
        F.sum("new_span").cast("long").alias("n_spans"),
    )
    # docs whose draw selected zero positions still emit a row (the
    # uncorrupted passthrough branch)
    return (
        base.join(per_doc.drop("n_tok"), "doc_id", "left")
        .select(
            "doc_id", "n_tok",
            F.coalesce("n_noise", F.lit(0)).cast("long").alias("n_noise"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        )
        .select(
            "doc_id", "n_tok", "n_noise", "n_spans",
            (F.col("n_tok") - F.col("n_noise") + F.col("n_spans"))
            .cast("long").alias("input_len"),
            (F.col("n_noise") + F.col("n_spans") + 1).cast("long")
            .alias("target_len"),
        )
    )
