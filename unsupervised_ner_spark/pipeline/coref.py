"""Pronominal coreference resolution (heuristic, distributed).

The classic KG-construction step between mention detection and triple
extraction: a pronoun inherits the identity of the nearest preceding
compatible typed mention (the Hobbs-lite / recency baseline every
rule-based coref stack starts from — see e.g. the CoreNLP deterministic
sieve, Lee et al. CL 2013, whose first sieves are exactly
recency + type agreement). The reference pipeline types mentions but
leaves pronouns untyped (``noun_tags`` keeps NN* only,
batched_main_NER.py:91-108); this operator is the engine-new recovery
pass that lets pronoun-borne facts attach to entities.

Scale shape: the pronoun table is exploded to at most ``max_back``
candidate sentence keys (a constant), the antecedent lookup is an
equi-join on (url, sent_idx) — sentence-co-partitioned, never
corpus-quadratic — and the winner is one row_number window per pronoun
whose partition holds at most max_back sentences' worth of mentions.
Nothing corpus-global; a 100 TB corpus shuffles pronoun and mention
tables on the same (url, sent) keys the rest of the KG chain uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# type-agreement classes (consolidated pred_group vocabulary, dims.py)
PERSON_PRONOUNS = ("he", "she", "him", "her", "his", "hers")
NONPERSON_PRONOUNS = ("it", "its")
ANY_PRONOUNS = ("they", "them", "their", "theirs")


def resolve_pronouns(
    pronouns: DataFrame, typed_mentions: DataFrame, max_back: int = 3
) -> DataFrame:
    """Resolve each pronoun occurrence (url, sent_idx, tok_idx, pronoun)
    to the nearest preceding compatible typed mention within ``max_back``
    sentences (strictly earlier sentence — intra-sentence antecedents are
    out of scope for the recency baseline).

    Compatibility: he/she/him/her/his/hers -> PERSON mentions;
    it/its -> any non-PERSON group; they/them/their/theirs -> any group.
    OTHER-group mentions are never antecedents (the ER convention).
    Nearest = smallest back distance, then highest mention_idx within the
    antecedent sentence (latest mention wins), then (surface, pred_group)
    ascending as the deterministic tie-break.

    Returns (url, sent_idx, tok_idx, pronoun, antecedent,
    antecedent_type, ant_sent_idx, back_dist); unresolved pronouns emit
    no row (the downstream attach is an inner join anyway).
    """
    cand = (
        pronouns.withColumn(
            "back_dist",
            F.explode(F.sequence(F.lit(1), F.lit(int(max_back)))),
        )
        .withColumn("ant_sent_idx", F.col("sent_idx") - F.col("back_dist"))
        .filter(F.col("ant_sent_idx") >= 0)
    )
    ments = typed_mentions.filter(F.col("pred_group") != "OTHER").select(
        "url",
        F.col("sent_idx").alias("ant_sent_idx"),
        "mention_idx",
        "surface",
        "pred_group",
    )
    person = F.col("pronoun").isin(*PERSON_PRONOUNS)
    nonperson = F.col("pronoun").isin(*NONPERSON_PRONOUNS)
    joined = cand.join(ments, ["url", "ant_sent_idx"]).filter(
        F.when(person, F.col("pred_group") == "PERSON")
        .when(nonperson, F.col("pred_group") != "PERSON")
        .otherwise(F.lit(True))
    )
    w = Window.partitionBy("url", "sent_idx", "tok_idx").orderBy(
        F.col("back_dist").asc(),
        F.col("mention_idx").desc(),
        F.col("surface").asc(),
        F.col("pred_group").asc(),
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "url",
            "sent_idx",
            "tok_idx",
            "pronoun",
            F.col("surface").alias("antecedent"),
            F.col("pred_group").alias("antecedent_type"),
            F.col("ant_sent_idx").cast("long").alias("ant_sent_idx"),
            F.col("back_dist").cast("long").alias("back_dist"),
        )
    )


def resolve_definite_nps(
    nps: DataFrame, typed_mentions: DataFrame, max_back: int = 3
) -> DataFrame:
    """Definite-NP (nominal) coreference: "the drug", "the disease" →
    the nearest preceding mention of the REQUIRED group (the second
    deterministic sieve after pronouns — same recency machinery, but the
    anaphor names its antecedent's type outright, so agreement is an
    equality test instead of the pronoun class map). Input
    (url, sent_idx, tok_idx, np_group); output mirrors
    ``resolve_pronouns`` with ``np_group`` in place of ``pronoun``.

    Scale shape: identical to resolve_pronouns — constant explode,
    sentence-co-partitioned equi-join, per-anaphor window."""
    cand = (
        nps.withColumn(
            "back_dist",
            F.explode(F.sequence(F.lit(1), F.lit(int(max_back)))),
        )
        .withColumn("ant_sent_idx", F.col("sent_idx") - F.col("back_dist"))
        .filter(F.col("ant_sent_idx") >= 0)
    )
    ments = typed_mentions.filter(F.col("pred_group") != "OTHER").select(
        "url",
        F.col("sent_idx").alias("ant_sent_idx"),
        "mention_idx",
        "surface",
        "pred_group",
    )
    joined = cand.join(ments, ["url", "ant_sent_idx"]).filter(
        F.col("pred_group") == F.col("np_group")
    )
    w = Window.partitionBy("url", "sent_idx", "tok_idx").orderBy(
        F.col("back_dist").asc(),
        F.col("mention_idx").desc(),
        F.col("surface").asc(),
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "url",
            "sent_idx",
            "tok_idx",
            "np_group",
            F.col("surface").alias("antecedent"),
            F.col("ant_sent_idx").cast("long").alias("ant_sent_idx"),
            F.col("back_dist").cast("long").alias("back_dist"),
        )
    )
