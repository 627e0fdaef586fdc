"""unsupervised_ner_spark — PySpark-native knowledge-graph construction engine.

A from-scratch, Spark-first re-expression of the query/data semantics of
``ajitrajasekharan/unsupervised_NER`` (reference at /root/reference, read-only):
self-supervised NER via masked-LM descriptor typing, extended into a full
KG-construction pipeline (pages -> sentences -> mentions -> typing -> BIO tags
-> triples -> entity resolution -> canonical graph tables) plus the
training-data-pipeline operators a 100 TB corpus needs (dedup, similarity
search, text stats, multimodal plumbing).

Layout
------
- ``kernel/``    pure-Python/numpy reference-semantics kernels (v2 "batched"
                 semantics of ``batched_main_NER.py``); single-process oracle
                 used by tests AND inside vectorized pandas UDFs.
- ``pipeline/``  the Spark DataFrame pipeline stages (declarative-first).
- ``ops/``       large-scale corpus operators (dedup, ANN, text stats, ...).
- ``resources/`` vendored public dimension data from the reference repo
                 (entity map, bootstrap label vocabularies, benchmark lists).
"""

__version__ = "0.1.0"
