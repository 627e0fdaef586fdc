"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with struct metadata. The
decode/feature-extract kernels are STUBBED (no PIL/ffmpeg in this
container) behind ``MediaDecodeStub`` — but the Spark-side plumbing
(schema, Arrow batch shape, mapInPandas signature, partition sizing) is
real and tested with a deterministic fake decoder.

``synth_media`` derives a deterministic binary payload from document text so
every engine (and the DuckDB oracle, via octet_length/md5) sees identical
bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("media_type", T.StringType()),
    ]
)


def synth_media(documents: DataFrame) -> DataFrame:
    """documents -> (doc_id, payload binary): deterministic fake media.
    Goes through the adaptive ingest spread: the per-payload Python
    kernels downstream (aHash/pHash DCT) otherwise run on the single
    partition a one-row-group parquet scan yields; no-op at production
    file counts (layout.spread_small_scan)."""
    from unsupervised_ner_spark.ops.layout import spread_small_scan

    return spread_small_scan(documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    ))


class MediaDecodeStub:
    """Stand-in for a real image decoder.

    The real implementation (PIL / torchvision) is not installable here;
    ``decode`` derives deterministic pseudo-dimensions from the payload so
    tests exercise the full UDF path. Anything needing true pixel data
    raises NotImplementedError.
    """

    @staticmethod
    def decode(payload: bytes) -> tuple[int, int]:
        n = len(payload)
        return (64 + n % 577, 64 + (n * 31) % 433)

    @staticmethod
    def pixels(payload: bytes):  # pragma: no cover - by design
        raise NotImplementedError("real image decoding unavailable in this container")


FRAME = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
    ]
)


def frame_sample(media: DataFrame, chunk_bytes: int = 256, every_k: int = 4) -> DataFrame:
    """Video-style frame sampling over an opaque binary payload: treat the
    payload as fixed-size chunks ("frames"), emit every k-th one with a
    content hash — the exact plumbing shape of ffmpeg keyframe extraction
    (binary in, one row per sampled frame out, batch-iterator UDF), with the
    codec replaced by deterministic byte slicing so both engines replay it.

    Scale: narrow flatMap; output rows/doc = ceil(n_bytes/chunk)/k. A real
    decoder slots into the loop body; partition sizing and schema carry over
    unchanged.

    Hash convention: md5 over the UPPERCASE HEX of the chunk (not the raw
    bytes) — DuckDB has no blob md5/substring, so both engines hash the hex
    projection; still a content fingerprint.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_md5": [], "n_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = max((len(b) + chunk_bytes - 1) // chunk_bytes, 1)
                for fi in range(0, n_frames, every_k):
                    chunk = b[fi * chunk_bytes : (fi + 1) * chunk_bytes]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(fi)
                    out["frame_md5"].append(
                        hashlib.md5(chunk.hex().upper().encode()).hexdigest()
                    )
                    out["n_bytes"].append(len(chunk))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FRAME)


RESIZED = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("thumb_w", T.IntegerType()),
        T.StructField("thumb_h", T.IntegerType()),
        T.StructField("thumb_md5", T.StringType()),
    ]
)


def resize_thumbnail(media: DataFrame, max_side: int = 32) -> DataFrame:
    """Image-resize plumbing: compute the aspect-preserving thumbnail
    dimensions from the (stub-decoded) source dims and a deterministic
    stand-in for the resampled bytes (md5 of payload + target dims — a real
    PIL ``Image.thumbnail`` slots into the same loop; the Spark-side
    contract is identical)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoder = MediaDecodeStub()
        for pdf in batches:
            out = {"doc_id": [], "thumb_w": [], "thumb_h": [], "thumb_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                w, h = decoder.decode(b)
                scale = max_side / max(w, h)
                tw = max(int(w * scale), 1)
                th = max(int(h * scale), 1)
                out["doc_id"].append(doc_id)
                out["thumb_w"].append(tw)
                out["thumb_h"].append(th)
                # hex-projection hashing (see frame_sample hash convention)
                out["thumb_md5"].append(
                    hashlib.md5((b.hex().upper() + f":{tw}x{th}").encode()).hexdigest()
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, RESIZED)


def media_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads.

    This is the template for every multimodal kernel: iterator-of-batches,
    per-executor decoder init, binary in / struct out.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoder = MediaDecodeStub()
        for pdf in batches:
            payloads = pdf["payload"]
            dims = [decoder.decode(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "content_md5": [hashlib.md5(bytes(p)).hexdigest() for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "media_type": "image/fake",
                }
            )

    return media.mapInPandas(run, MEDIA_META)


AHASH = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("ahash_bits", T.StringType()),
        T.StructField("n_ones", T.IntegerType()),
    ]
)


def average_hash(media: DataFrame, n_px: int = 64) -> DataFrame:
    """Perceptual average-hash (aHash) over the opaque media payload —
    the near-duplicate signature image dedup pipelines compute per asset
    (resize to 8x8 grayscale, threshold each pixel at the mean, pack 64
    bits). The decode+resize step is the stubbed stage (no PIL): the
    "pixel" grid is the payload's bytes sampled at ``n_px`` evenly spaced
    offsets (``byte[(j*n) div n_px]``) — deterministic, so the DuckDB
    oracle replays it from the hex projection while the Spark side runs
    the REAL kernel shape (iterator-of-batches mapInPandas, raw bytes in,
    fixed-width signature out; a real decoder swaps into the loop body
    and nothing else changes). The signature is emitted as the 64-char
    bit string (no sign games packing bit 63 into a long); equal strings
    = candidate duplicates, Hamming distance = XOR popcount downstream.

    Scale shape: narrow map-only (one Arrow-batched Python stage), no
    shuffle; output is one fixed-width row per asset."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_bytes": [], "ahash_bits": [], "n_ones": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                pix = [b[(j * n) // n_px] if n else 0 for j in range(n_px)]
                mean = sum(pix) // n_px
                bits = "".join("1" if p >= mean else "0" for p in pix)
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(n)
                out["ahash_bits"].append(bits)
                out["n_ones"].append(bits.count("1"))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, AHASH)


def audio_windows(
    meta: DataFrame, win: int = 16000, hop: int = 8000
) -> DataFrame:
    """Fixed-size analysis windows over audio-length metadata — the
    frame plan a feature-extraction pass (fbank / wav2vec chunking) maps
    over, computed from (doc_id, n_samples, sample_rate) WITHOUT touching
    payload bytes. Windows start at multiples of ``hop`` and must fit
    entirely (``start + win <= n_samples``); clips shorter than one
    window emit zero rows.

    Scale shape: metadata-only projection + an in-place ``sequence``
    explode (fan-out = n_samples/hop per clip, bounded by clip length) —
    map-only, no Python, no shuffle; the decode stays behind the
    mapInPandas seam like the image ops (multimodal.MediaDecodeStub)."""
    n = F.col("n_samples").cast("long")
    starts = F.when(
        n >= win, F.sequence(F.lit(0).cast("long"), n - win, F.lit(hop).cast("long"))
    ).otherwise(F.array().cast("array<long>"))
    ex = meta.select(
        "doc_id", "n_samples", "sample_rate",
        F.posexplode(starts).alias("window_idx", "start_sample"),
    )
    return ex.select(
        "doc_id", "n_samples", "sample_rate",
        F.col("window_idx").cast("long").alias("window_idx"),
        "start_sample",
        (F.col("start_sample") + win).cast("long").alias("end_sample"),
    )


def scene_segments(frames: DataFrame, hamming_threshold: int = 10) -> DataFrame:
    """Scene segmentation over the sampled-frame table: a new scene opens
    where consecutive frame signatures differ by >= ``hamming_threshold``
    bits — the shot-boundary pass a video curation pipeline runs on
    keyframe perceptual hashes. The signature here is the 32-bit integer
    prefix of the frame's content hash (the MediaDecodeStub philosophy:
    a real pHash slots in without changing a line of the window logic).

    Output: one row per (doc_id, scene_id) with frame count and the
    frame-index range.

    Scale shape: one lag window + one running-sum window PARTITIONED BY
    doc (partition size = frames per video, bounded by clip length), then
    one aggregate — the gaps-and-islands shape of fact_intervals applied
    to the multimodal column."""
    from pyspark.sql import Window

    sig = F.conv(F.substring("frame_md5", 1, 8), 16, 10).cast("long")
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    s = frames.select("doc_id", "frame_idx", sig.alias("sig"))
    marked = s.withColumn("prev", F.lag("sig").over(w)).withColumn(
        "boundary",
        F.when(
            F.col("prev").isNull()
            | (F.expr("bit_count(sig ^ prev)") >= hamming_threshold),
            F.lit(1),
        ).otherwise(F.lit(0)).cast("long"),
    )
    scened = marked.withColumn(
        "scene_id",
        (
            F.sum("boundary").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - 1
        ).cast("long"),
    )
    return scened.groupBy("doc_id", "scene_id").agg(
        F.count("*").cast("long").alias("n_frames"),
        F.min("frame_idx").cast("long").alias("first_frame"),
        F.max("frame_idx").cast("long").alias("last_frame"),
    )


# Fixed-point DCT-II basis for the perceptual hash: C[k][n] =
# round(2^14 * cos(pi * (2n+1) * k / 16)), k,n in 0..7, flattened
# row-major. Computed ONCE here and imported by the DuckDB twin
# (oracle_sql.mm_phash embeds these exact integers), so both engines run
# identical integer arithmetic end-to-end — no float, no libm drift
# between the engines (the Hearst-regex import precedent).
import math as _math

PHASH_SCALE = 1 << 14
PHASH_DCT = [
    round(PHASH_SCALE * _math.cos(_math.pi * (2 * n + 1) * k / 16.0))
    for k in range(8)
    for n in range(8)
]

PHASH = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("phash_bits", T.StringType()),
        T.StructField("n_ones", T.IntegerType()),
    ]
)


def perceptual_hash(media: DataFrame) -> DataFrame:
    """Perceptual DCT hash (pHash) over the opaque media payload — the
    frequency-domain near-duplicate signature (robust to brightness /
    local edits where aHash is not): sample an 8x8 "pixel" grid, 2-D
    DCT-II in exact fixed-point integers (PHASH_DCT, scale 2^14), then
    threshold each of the 63 AC coefficients at their median (sorted
    element index 31, strict >) — DC emits a constant 0 bit so the
    signature stays 64 wide like aHash. The decode+resize stage is the
    stubbed seam (no PIL): pixels are payload bytes sampled at
    ``byte[(j*n) div 64]`` exactly like average_hash, so the DuckDB twin
    replays the whole chain from the hex projection while the Spark side
    runs the REAL kernel shape (iterator-of-batches mapInPandas; a real
    32x32-decode + DCT drops into the loop body and nothing else
    changes).

    Integer exactness: |coef| <= 8 * 8 * 255 * 2^28 < 2^45 — well inside
    int64, identical in Python and DuckDB.

    Scale shape: narrow map-only Arrow-batched stage, no shuffle; one
    fixed-width row per asset."""
    C = [PHASH_DCT[k * 8:(k + 1) * 8] for k in range(8)]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_bytes": [], "phash_bits": [], "n_ones": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                pix = [
                    [b[((x * 8 + y) * n) // 64] if n else 0 for y in range(8)]
                    for x in range(8)
                ]
                # coef = C @ pix @ C^T, exact ints
                cp = [
                    [sum(C[u][x] * pix[x][y] for x in range(8)) for y in range(8)]
                    for u in range(8)
                ]
                coef = [
                    [sum(cp[u][y] * C[v][y] for y in range(8)) for v in range(8)]
                    for u in range(8)
                ]
                ac = sorted(
                    coef[u][v] for u in range(8) for v in range(8) if u or v
                )
                med = ac[31]
                bits = "".join(
                    "0" if (u == 0 and v == 0)
                    else ("1" if coef[u][v] > med else "0")
                    for u in range(8) for v in range(8)
                )
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(n)
                out["phash_bits"].append(bits)
                out["n_ones"].append(bits.count("1"))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, PHASH)


def phash_pairs(
    signatures: DataFrame, max_hamming: int = 7, max_bucket: int = 100
) -> DataFrame:
    """Hamming-near media pairs over pHash signatures: Manku-style block
    blocking with n=8 8-bit blocks and k=7 — any pair within Hamming
    distance 7 agrees on AT LEAST one block (pigeonhole), so grouping on
    (block_idx, block_bits) has exact recall; candidates are then
    verified with the true 64-position Hamming count and kept when
    ``<= max_hamming``. The simhash_pairs shape lifted to the media
    signature table (same cap rationale: a boilerplate byte pattern piles
    docs onto one block value — the cap keeps a degenerate key from
    going quadratic; size filtering is a shuffle join, never a
    corpus-sized broadcast).

    Scale shape: 8 blocking rows per asset, one bucket-size aggregate
    (persisted once with the blocking table), bucket self-join, distinct
    to pair granularity, packed-long ``bit_count(xor)`` Hamming verify
    (no Python).

    The signature travels as ONE packed long, not the 64-char bit string
    (VERDICT r05 item 2): the top bit folds in as -2^63 and the low 63
    bits via ``conv(_, 2, 10)`` (< 2^63, so the long cast is ANSI-safe
    for ANY bit string — the _assemble_signed64 SimHash precedent);
    ``bit_count(sig_a ^ sig_b)`` counts exactly the differing bit
    positions — bit-identical to the former 64-step per-character walk
    (the video_scenes/SimHash idiom, guide §2.3: narrower shuffle bytes,
    no interpreted 64-iteration aggregate per candidate pair)."""
    from unsupervised_ner_spark.caching import scoped_persist

    top = F.when(
        F.substring("phash_bits", 1, 1) == "1", F.lit(-(2 ** 63))
    ).otherwise(F.lit(0))
    packed = signatures.select(
        "doc_id", "phash_bits",
        (top + F.conv(F.substring("phash_bits", 2, 63), 2, 10).cast("long"))
        .alias("sig"),
    )
    blocks = scoped_persist(
        packed.select(
            "doc_id", "sig",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.substring("phash_bits", i * 8 + 1, 8).alias("bits"),
                    )
                    for i in range(8)
                ])
            ).alias("b"),
        ).select("doc_id", "sig", F.col("b.blk").alias("blk"),
                 F.col("b.bits").alias("bits"))
    )
    ok = blocks.groupBy("blk", "bits").agg(F.count("*").alias("n")).filter(
        F.col("n") <= max_bucket
    ).select("blk", "bits")
    small = blocks.join(ok, ["blk", "bits"])
    a = small.select("blk", "bits", F.col("doc_id").alias("doc_a"),
                     F.col("sig").alias("sig_a"))
    b = small.select("blk", "bits", F.col("doc_id").alias("doc_b"),
                     F.col("sig").alias("sig_b"))
    cand = (
        a.join(b, ["blk", "bits"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("long")
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


ENERGY = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("chunk_idx", T.IntegerType()),
        T.StructField("chunk_len", T.IntegerType()),
        T.StructField("energy_sum", T.LongType()),
    ]
)


def chunk_energy(media: DataFrame, chunk_bytes: int = 256) -> DataFrame:
    """Per-chunk energy over the opaque payload — the feature a VAD /
    silence-trim pass computes per audio frame (sum of sample magnitudes;
    here the stubbed decode reads raw payload bytes, the frame_sample
    precedent — a real fbank energy drops into the loop body unchanged).
    One row per fixed-size chunk with its exact byte sum.

    Scale shape: narrow Arrow-batched flatMap, no shuffle; rows/doc =
    ceil(n_bytes/chunk)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "chunk_idx": [], "chunk_len": [],
                   "energy_sum": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for i in range(0, max(len(b), 1), chunk_bytes):
                    c = b[i:i + chunk_bytes]
                    out["doc_id"].append(doc_id)
                    out["chunk_idx"].append(i // chunk_bytes)
                    out["chunk_len"].append(len(c))
                    out["energy_sum"].append(sum(c))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, ENERGY)


def voice_segments(
    energy: DataFrame, threshold_num: int = 95, threshold_den: int = 1
) -> DataFrame:
    """Voice-activity segments over the chunk-energy table: a chunk is
    VOICED when its mean byte value clears threshold_num/threshold_den
    (integer cross-multiplied — energy_sum * den >= num * chunk_len);
    maximal runs of consecutive voiced chunks become segments via the
    gaps-and-islands trick (chunk_idx − voiced_rank is constant within a
    run — the scene_segments / fact_intervals precedent). The
    silence-trim pass an audio curation pipeline runs before
    transcription. Returns (doc_id, seg_idx, start_chunk, end_chunk,
    n_chunks, energy_total).

    Scale shape: doc-keyed windows only (partition = one clip's chunks),
    one aggregate; nothing corpus-global."""
    from pyspark.sql import Window

    voiced = energy.filter(
        (F.col("chunk_len") > 0)  # a zero-length payload row is silence
        & (
            F.col("energy_sum") * threshold_den
            >= F.lit(threshold_num) * F.col("chunk_len")
        )
    )
    w = Window.partitionBy("doc_id").orderBy("chunk_idx")
    runs = voiced.withColumn(
        "island", F.col("chunk_idx") - F.row_number().over(w)
    )
    seg = runs.groupBy("doc_id", "island").agg(
        F.min("chunk_idx").cast("long").alias("start_chunk"),
        F.max("chunk_idx").cast("long").alias("end_chunk"),
        F.count("*").cast("long").alias("n_chunks"),
        F.sum("energy_sum").cast("long").alias("energy_total"),
    )
    w2 = Window.partitionBy("doc_id").orderBy("start_chunk")
    return seg.select(
        "doc_id",
        (F.row_number().over(w2) - 1).cast("long").alias("seg_idx"),
        "start_chunk", "end_chunk", "n_chunks", "energy_total",
    )


FINGERPRINT = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("t", T.LongType()),
        T.StructField("fp_hash", T.LongType()),
    ]
)


def audio_fingerprints(
    media: DataFrame,
    frame_bytes: int = 32,
    n_bands: int = 32,
    max_dt: int = 3,
) -> DataFrame:
    """Constellation fingerprints (Wang's Shazam hashing, ISMIR'03) over
    the opaque audio payload: per fixed-size frame a bank of ``n_bands``
    energy bands (the stubbed filterbank sums the frame's bytes by
    position mod ``n_bands`` — a real STFT/fbank drops into the loop
    body unchanged, the chunk_energy precedent), one peak per frame
    (max-energy band, ties to the smallest band — argmax-first), then
    anchor-target pairs in the ``1..max_dt`` fan-out window packed as
    ``(f1 * n_bands + f2) * (max_dt + 1) + dt``. Exact integer
    arithmetic end-to-end.

    Scale shape: narrow Arrow-batched flatMap, no shuffle; rows/doc =
    at most max_dt * n_frames."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "t": [], "fp_hash": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if not b:
                    continue
                a = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                idx = np.arange(len(a))
                tcol = idx // frame_bytes
                band = idx % n_bands
                n_frames = int(tcol[-1]) + 1
                e = np.zeros((n_frames, n_bands), dtype=np.int64)
                np.add.at(e, (tcol, band), a)
                peaks = np.argmax(e, axis=1)  # first max = smallest band
                for t in range(n_frames):
                    for dt in range(1, max_dt + 1):
                        if t + dt >= n_frames:
                            break
                        h = (
                            int(peaks[t]) * n_bands + int(peaks[t + dt])
                        ) * (max_dt + 1) + dt
                        out["doc_id"].append(doc_id)
                        out["t"].append(t)
                        out["fp_hash"].append(h)
            yield pd.DataFrame(
                out, columns=["doc_id", "t", "fp_hash"]
            ).astype({"doc_id": "int64", "t": "int64", "fp_hash": "int64"})

    return media.mapInPandas(run, FINGERPRINT)


def audio_match_pairs(
    fingerprints: DataFrame,
    min_aligned: int = 8,
    df_cap: int | None = None,
) -> DataFrame:
    """Shazam's matching step over a fingerprint inverted index: docs
    sharing constellation hashes at a CONSISTENT time offset are the
    same recording (possibly shifted). Hashes shared by fewer than two
    docs are dropped (they can't match anyone); hashes appearing in more
    than ``df_cap`` distinct docs are stop-hashes (the df-capped shingle
    precedent — a ubiquitous motif pairs everyone with everyone and
    identifies no one). Within a hash bucket, occurrence pairs
    (doc_a < doc_b) vote for their frame offset t_a - t_b; per doc pair
    the modal offset (count DESC, offset ASC) wins, and pairs below
    ``min_aligned`` aligned votes are noise.

    Scale shape: ONE shuffle of the fingerprint stream onto fp_hash
    feeds both the document-frequency aggregate and the bucket
    self-join (persisted once); the self-join is equi on fp_hash with
    both sides df-capped, so a bucket is never corpus-quadratic; the
    offset histogram and the modal pick are bounded per doc pair.
    df_cap=None sizes adaptively: clamp(icbrt_ceil(n_docs), 50, 5000)
    — one O(1) driver count, the codebook-sizing precedent."""
    from unsupervised_ner_spark.caching import scoped_persist
    from unsupervised_ner_spark.ops.dedup import icbrt_ceil
    from pyspark.sql import Window

    fp = scoped_persist(fingerprints.select("doc_id", "t", "fp_hash"))
    if df_cap is None:
        n_docs = fp.select("doc_id").distinct().count()
        df_cap = max(50, min(5000, icbrt_ceil(max(n_docs, 1))))
    eligible = (
        fp.groupBy("fp_hash")
        .agg(F.countDistinct("doc_id").cast("long").alias("n_docs"))
        .filter((F.col("n_docs") >= 2) & (F.col("n_docs") <= df_cap))
        .select("fp_hash")
    )
    keyed = scoped_persist(fp.join(eligible, "fp_hash"))
    a = keyed.select(
        "fp_hash", F.col("doc_id").alias("doc_a"), F.col("t").alias("t_a")
    )
    b = keyed.select(
        "fp_hash", F.col("doc_id").alias("doc_b"), F.col("t").alias("t_b")
    )
    votes = (
        a.join(b, "fp_hash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy(
            "doc_a", "doc_b",
            (F.col("t_a") - F.col("t_b")).cast("long").alias("offset"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    wm = Window.partitionBy("doc_a", "doc_b").orderBy(
        F.desc("n"), F.asc("offset")
    )
    return (
        votes.withColumn("rk", F.row_number().over(wm))
        .withColumn(
            "n_shared",
            F.sum("n").over(Window.partitionBy("doc_a", "doc_b")).cast("long"),
        )
        .filter((F.col("rk") == 1) & (F.col("n") >= min_aligned))
        .select(
            "doc_a", "doc_b", "offset",
            F.col("n").alias("n_aligned"), "n_shared",
        )
    )


def caption_groups(pairs: DataFrame, media: DataFrame) -> DataFrame:
    """Image-text pair consolidation by perceptual-hash group — the
    LAION-style dedup step of multimodal dataset prep: the SAME image
    recrawled from many pages arrives with many alt-texts; grouping the
    pair table by the image's pHash collapses those into one image
    group with its caption inventory (keep the group once, train on the
    caption diversity). ``pairs`` is (img_id, caption); ``media`` is the
    (doc_id=img_id, payload) table the hash runs over. Output per hash
    group: images, pairs, distinct captions, and the deterministic
    min-caption representative.

    Scale shape: the pHash is the existing narrow Arrow-batched stage;
    the pair table joins it on img_id (the pair store's natural key);
    the three distinct-counts are CASCADED two-level aggregates (the
    triples_temporal device — no count-distinct Expand over the pair
    stream)."""
    hashes = perceptual_hash(media).select(
        F.col("doc_id").alias("img_id"), "phash_bits"
    )
    cell = (
        pairs.join(hashes, "img_id")
        .groupBy("phash_bits", "img_id", "caption")
        .agg(F.count("*").cast("long").alias("n"))
    )
    per_img = cell.groupBy("phash_bits", "img_id").agg(
        F.sum("n").cast("long").alias("n"),
    )
    per_cap = cell.groupBy("phash_bits", "caption").agg(
        F.sum("n").cast("long").alias("n"),
    )
    imgs = per_img.groupBy("phash_bits").agg(
        F.count("*").cast("long").alias("n_images"),
        F.sum("n").cast("long").alias("n_pairs"),
    )
    caps = per_cap.groupBy("phash_bits").agg(
        F.count("*").cast("long").alias("n_captions"),
        F.min("caption").alias("rep_caption"),
    )
    return imgs.join(caps, "phash_bits").select(
        "phash_bits", "n_images", "n_pairs", "n_captions", "rep_caption",
    )
