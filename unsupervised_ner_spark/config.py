"""Frozen run configuration (S4).

The reference re-reads its JSON config on every access (``cf.read_config``
called 8x per UnsupNER init, config_utils.py:11-19, batched_main_NER.py:71-84).
The engine freezes configuration once into an immutable dataclass that ships
to executors inside UDF closures/broadcasts — no per-call file IO.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path

from unsupervised_ner_spark.kernel.constants import TOP_K_DESCS


@dataclass(frozen=True)
class RunConfig:
    """Engine knobs mirroring config.json keys where they still apply."""

    model: str = "a100"                 # descriptor fixture / weights id
    suppress_untagged: bool = True      # SUPPRESS_UNTAGGED (config.json:6)
    full_sentence_tag: bool = True      # FULL_SENTENCE_TAG (config.json:5)
    common_descs: frozenset[str] = frozenset()  # COMMON_DESCS_FILE contents
    top_k_descs: int = TOP_K_DESCS
    lang_filter: str | None = "en"
    n_buckets: int = 64                 # url-hash partitioning
    lsh_num_hashes: int = 8
    lsh_band_size: int = 2
    lsh_max_bucket: int = 50

    @classmethod
    def from_json(cls, path: str | Path) -> "RunConfig":
        raw = json.loads(Path(path).read_text())
        common: frozenset[str] = frozenset()
        if raw.get("COMMON_DESCS_FILE"):
            p = Path(raw["COMMON_DESCS_FILE"])
            if p.exists():
                common = frozenset(
                    l.strip() for l in p.read_text().splitlines() if l.strip()
                )
        return cls(
            suppress_untagged=raw.get("SUPPRESS_UNTAGGED", "1") == "1",
            full_sentence_tag=raw.get("FULL_SENTENCE_TAG", "1") == "1",
            common_descs=common,
        )
