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
