"""Dimension-table loaders (entity map, signature vocab, precedence lists).

All dimensions are tiny (<= ~25k rows) and broadcast-friendly. The files in
``resources/`` are vendored public data files from the reference repo:

- ``entity_types_consolidated.txt`` — 21 consolidated groups / 88 labels,
  loader semantics per ``read_entity_map`` (batched_main_NER.py:48-66).
- ``a100_labels.txt`` / ``bbc_labels.txt`` — bootstrapped vocab->label lists
  (ner_labeling/, built offline per ner_labeling/construct_bs.py). The
  engine's signature table merges duplicate terms case-insensitively and
  strips UNTAGGED_ENTITY when other labels exist, following
  ``construct_bs.py:35-57`` merge semantics.
- ``benchmark/*.txt`` — the three biomedical benchmark term lists.

Cluster counts (the reference's ``e_count`` field, produced offline by the
external bert_vector_clustering repo and not present in this snapshot) are
synthesized deterministically per (term, label) via crc32 so the whole
fixture world is reproducible from vendored text.
"""

from __future__ import annotations

import json
import zlib
from functools import lru_cache
from pathlib import Path

from unsupervised_ner_spark.kernel.constants import UNTAGGED_LABEL
from unsupervised_ner_spark.respath import resources_root

RESOURCES = resources_root()


@lru_cache(maxsize=None)
def load_entity_map() -> dict[str, str]:
    """subtype -> consolidated group; each group maps to itself
    (read_entity_map semantics, batched_main_NER.py:48-66)."""
    emap: dict[str, str] = {}
    for line in (RESOURCES / "entity_types_consolidated.txt").read_text().splitlines():
        parts = line.rstrip("\n").split()
        if not parts:
            continue
        if len(parts) == 1:
            assert parts[0] not in emap
            emap[parts[0]] = parts[0]
        else:
            assert len(parts) == 2
            if parts[0] not in emap:
                emap[parts[0]] = parts[0]
            for sub in parts[1].split("/"):
                assert sub not in emap, sub
                emap[sub] = parts[0]
    return emap


def synth_count(term: str, label: str) -> int:
    """Deterministic stand-in for the offline cluster count: 3..20."""
    return 3 + zlib.crc32(f"{term}|{label}".encode()) % 18


@lru_cache(maxsize=None)
def load_signatures(model: str = "a100") -> dict[str, tuple[tuple[str, ...], tuple[int, ...]]]:
    """term(lower) -> (labels, counts). Merge semantics follow
    ner_labeling/construct_bs.py:14-57: lowercase the term, dedupe labels in
    first-seen order, drop UNTAGGED_ENTITY when any other label exists."""
    fname = {"a100": "a100_labels.txt", "bbc": "bbc_labels.txt"}[model]
    # the vendored vocab lists are BERT-vocab-derived; the reference's full
    # labels.txt (external bert_vector_clustering artifact) also covers
    # domain terms, so augment with the vendored benchmark lists (FIXTURES.md
    # §4 "plus the BC5CDR/NCBI benchmark terms") and a curated engine list
    # for the canned-corpus sentences.
    sources = [
        fname,
        "engine_terms.txt",
        "benchmark/BC5CDR_chemical.txt",
        "benchmark/BC5CDR_disease.txt",
        "benchmark/NCBI_DISEASES.txt",
    ]
    merged: dict[str, list[str]] = {}
    for src in sources:
        for line in (RESOURCES / src).read_text().splitlines():
            parts = line.rstrip("\n").split()
            if len(parts) != 2:
                continue
            term = parts[0].lower()
            labels = merged.setdefault(term, [])
            for label in parts[1].rstrip("/").split("/"):
                if label not in labels:
                    labels.append(label)
    out: dict[str, tuple[tuple[str, ...], tuple[int, ...]]] = {}
    emap = load_entity_map()
    for term, labels in merged.items():
        if UNTAGGED_LABEL in labels and len(labels) > 1:
            labels = [l for l in labels if l != UNTAGGED_LABEL]
        labels = [l for l in labels if l in emap]  # guard vocab drift
        if not labels:
            labels = [UNTAGGED_LABEL]
        counts = tuple(synth_count(term, l) for l in labels)
        out[term] = (tuple(labels), counts)
    # engine fixture addition: the numeric-dummy descriptor term ("two",
    # main_NER.py:19,486-496) must resolve to NUMBER so integer mentions
    # type as MEASURE[NUMBER]; the reference's full MLM vocab labels file
    # (external artifact) covers number words, these curated lists don't.
    out.setdefault("two", (("NUMBER",), (10,)))
    return out


@lru_cache(maxsize=None)
def load_benchmark_terms(dataset: str) -> dict[str, str]:
    """term(lower) -> expected label, from the vendored benchmark lists."""
    fname = {
        "bc5cdr_chem": "BC5CDR_chemical.txt",
        "bc5cdr_disease": "BC5CDR_disease.txt",
        "ncbi_disease": "NCBI_DISEASES.txt",
    }[dataset]
    out: dict[str, str] = {}
    for line in (RESOURCES / "benchmark" / fname).read_text().splitlines():
        parts = line.split()
        if len(parts) == 2:
            out[parts[0].lower()] = parts[1]
    return out


@lru_cache(maxsize=None)
def load_precedence() -> dict[str, list[str]]:
    """Ensemble precedence/common lists (ensemble/config.json:2-33)."""
    return json.loads((RESOURCES / "ensemble_precedence.json").read_text())


def signatures_rows(model: str = "a100") -> list[tuple[str, list[str], list[int]]]:
    """Signature dim as rows for createDataFrame / parquet writes."""
    return [
        (term, list(labels), list(counts))
        for term, (labels, counts) in sorted(load_signatures(model).items())
    ]


def entity_map_rows() -> list[tuple[str, str]]:
    return sorted(load_entity_map().items())
