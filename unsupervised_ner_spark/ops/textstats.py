"""Text analysis operators: token counting, quality scoring, language-ID,
document fingerprinting.

Design rule: outputs are integers/strings (hash-stable across engines);
ratios are derivable downstream. All pure column expressions — JVM-side,
whole-stage codegen, no Python. At 100 TB these run as a single narrow scan
with column pruning (only ``text`` is read).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword sets for the n-gram/stopword language heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "das", "und", "ist", "von", "nicht", "mit", "ein", "zu"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con", "para", "es"],
    "fr": ["le", "la", "les", "des", "est", "dans", "pour", "que", "une", "sur"],
}

EN_STOPWORDS = LANG_STOPWORDS["en"]


def tokens_ws(text: Column) -> Column:
    """Whitespace tokens (collapsing runs, str.split semantics)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != F.lit(""))


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-ish subunit count: split on non-alphanumerics AND camel/digit
    boundaries approximated by a regex token class."""
    return F.filter(
        F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: t != F.lit("")
    )


def doc_stats(documents: DataFrame) -> DataFrame:
    """Per-doc integer stats: whitespace tokens, distinct tokens, punct
    chars, stopword tokens, alpha chars."""
    toks = tokens_ws(F.col("text"))
    low = F.transform(toks, F.lower)
    return documents.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(low)).alias("n_distinct_tokens"),
        F.size(
            F.filter(low, lambda t: t.isin(*EN_STOPWORDS))
        ).alias("n_stopword_tokens"),
        (F.length("text") - F.length(F.regexp_replace("text", r"[!-/:-@\[-`{-~]", ""))).alias("n_punct_chars"),
        F.size(bpe_ish_tokens(F.col("text"))).alias("n_bpe_tokens"),
    )


def quality_class(stats: DataFrame) -> DataFrame:
    """Quality bucket from integer stats (length/stopword/dup ratios):
    'good' | 'short' | 'boilerplate' | 'lowlex'."""
    cls = (
        F.when(F.col("n_tokens") < 5, "short")
        .when(F.col("n_stopword_tokens") * 100 < F.col("n_tokens") * 3, "boilerplate")
        .when(F.col("n_distinct_tokens") * 100 < F.col("n_tokens") * 40, "lowlex")
        .otherwise("good")
    )
    return stats.select("doc_id", cls.alias("quality"))


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-vote language ID: argmax language by stopword hits,
    tie-break by language code asc, zero hits -> 'und'."""
    toks = F.transform(tokens_ws(F.col("text")), F.lower)

    def in_set(sw):
        # NB: close over sw; a 2-arg lambda would make pyspark bind the
        # element index to the second parameter
        return lambda t: t.isin(*sw)

    hits = [
        F.size(F.filter(toks, in_set(sw))).alias(f"h_{lang}")
        for lang, sw in sorted(LANG_STOPWORDS.items())
    ]
    df = documents.select("doc_id", *hits)
    langs = sorted(LANG_STOPWORDS)
    pairs = F.array(
        *[F.struct(F.col(f"h_{l}").alias("hits"), F.lit(l).alias("lang")) for l in langs]
    )
    best = F.array_sort(
        pairs, lambda a, b: F.when(a["hits"] > b["hits"], -1).when(a["hits"] < b["hits"], 1).otherwise(
            F.when(a["lang"] < b["lang"], -1).when(a["lang"] > b["lang"], 1).otherwise(0)
        )
    )[0]
    guess = F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    return df.select("doc_id", guess.alias("lang_guess"))


def fingerprint(documents: DataFrame) -> DataFrame:
    """Document fingerprint: md5 of the normalized token stream (lowercase,
    whitespace-collapsed) — the exact-dedup key."""
    norm = F.array_join(F.transform(tokens_ws(F.col("text")), F.lower), " ")
    return documents.select("doc_id", F.md5(norm).alias("fingerprint"))
