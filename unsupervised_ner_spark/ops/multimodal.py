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
    """documents -> (doc_id, payload binary): deterministic fake media."""
    return documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )


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
