"""Seeded, fully-distributed synthetic ``pages`` generator (FIXTURES.md §1).

Generates Common-Crawl-style pages(url, warc_ts, html, text, lang) of any
row count WITHOUT a driver-side loop: ``spark.range(n)`` + pure column
expressions, so the same generator scales from 100 rows (tests) to 10^8+
(bench) with perfect determinism (content is a function of the row id only).

- ``text`` is 2-12 sentences drawn from a fixed pool (reference-derived
  canned sentences + templated biomedical benchmark sentences), joined by
  newlines (one sentence per line, like the reference's batch files).
- Half the pages carry only ``html`` (deterministic boilerplate wrap; the
  extraction inverse is pipeline/text.py:extract_text), the other half only
  ``text`` — exercising both sides of the byte-identity invariant.
- Sentences repeat across pages by construction -> cross-document entity
  resolution has real work to do.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unsupervised_ner_spark import dims
from unsupervised_ner_spark.pipeline.text import SENT_SEP, wrap_html

# Plain-English pool: inspired by the reference's canned corpus
# (batched_main_NER.py:837-876 test_arr) — news + biomedical + edge cases
# (single token, numerics, multi-mention).
BASE_SENTENCES = [
    "Mesothelioma is caused by exposure to asbestos",
    "Ajit rajasekharan is an engineer at nFerence",
    "Imatinib mesylate is a drug and is used to treat nsclc",
    "He felt New York has a chance to win this year's competition",
    "Her hypophysitis secondary to ipilimumab was well managed with supplemental hormones",
    "Paul Erdos died at 83",
    "A eGFR below 60 indicates chronic kidney disease",
    "In humans mutations in Foxp2 leads to verbal dyspraxia",
    "The recent spread of Corona virus flu from China to Italy has caused global concern",
    "Hotel California topped the singles chart",
    "Elon Musk said Telsa will open a manufacturing plant in Europe",
    "He flew from New York to SFO",
    "Lionel Ritchie was popular in the 1980s",
    "John Doe flew from New York to Rio De Janiro via Miami",
    "engineer",
    "Austin called",
    "1880s marked the beginning of Jazz",
    "Everyday he rode his bicycle from Rajakilpakkam to Tambaram",
    "they flew from Boston to Rio De Janiro and had a mocha",
    "Fyodor Mikhailovich Dostoevsky was treated for Parkinsons",
    "Mesothelioma:__entity__ is caused by exposure to asbestos:__entity__",
    "Lou:__entity__ Gehrig:__entity__ who works in XCorp:__entity__ suffers from Parkinsons:__entity__",
    "Ajit:__entity__ Rajasekharan:__entity__ is an engineer at nFerence",
    "X,Y,Z are medicines",
]

TEMPLATES = [
    "Patients treated with {chem} developed {disease}",
    "Exposure to {chem} is a known cause of {disease}",
    "{disease} was managed with {chem} therapy",
    "A clinical trial of {chem} for {disease} enrolled 120 patients",
    "{chem} reduced the incidence of {disease} in mice",
]


@lru_cache(maxsize=1)
def sentence_pool() -> list[str]:
    """Deterministic pool: base corpus + templated benchmark sentences."""
    chems = sorted(dims.load_benchmark_terms("bc5cdr_chem"))[::7][:100]
    diseases = sorted(dims.load_benchmark_terms("bc5cdr_disease"))[::7][:100]
    pool = list(BASE_SENTENCES)
    for i, (c, d) in enumerate(zip(chems, diseases)):
        pool.append(TEMPLATES[i % len(TEMPLATES)].format(chem=c, disease=d))
    return pool


LANGS = ["en", "en", "en", "en", "de", "es", "fr", "en"]


def synth_pages(spark: SparkSession, n_pages: int, seed: int = 42) -> DataFrame:
    """Distributed deterministic pages table."""
    pool = sentence_pool()
    pool_arr = F.array(*[F.lit(s) for s in pool])
    lang_arr = F.array(*[F.lit(l) for l in LANGS])
    df = spark.range(n_pages).withColumnRenamed("id", "pid")
    pid = F.col("pid")
    n_sents = (F.pmod(pid * 7 + seed, 11) + 2).cast("int")
    sent_at = lambda j: F.element_at(  # noqa: E731
        pool_arr, (F.pmod(pid * 31 + j * 17 + seed, len(pool)) + 1).cast("int")
    )
    sents = F.transform(F.sequence(F.lit(0), n_sents - 1), sent_at)
    text = F.array_join(sents, SENT_SEP)
    url = F.concat(F.lit("https://synth.test/p/"), pid.cast("string"))
    lang = F.element_at(lang_arr, (F.pmod(pid * 13 + seed, len(LANGS)) + 1).cast("int"))
    ts = F.timestamp_seconds(F.lit(1600000000) + pid % 31536000)
    html_side = pid % 2 == 0
    return df.select(
        url.alias("url"),
        ts.alias("warc_ts"),
        F.when(html_side, F.encode(wrap_html(url, text), "UTF-8")).alias("html"),
        F.when(~html_side, text).alias("text"),
        lang.alias("lang"),
    )
