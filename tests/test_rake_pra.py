"""RAKE keyphrases vs a pure-Python replication; PRA feature table on a
hand KB."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

from unsupervised_ner_spark.ops.textstats import (
    EN_STOPWORDS,
    rake_keyphrases,
)
from unsupervised_ner_spark.pipeline.er import pra_features


def _python_rake(texts, max_phrase=3, topk=15):
    sw = set(EN_STOPWORDS)
    occurrences = []
    for t in texts:
        toks = t.lower().split()
        run = []
        for w in toks + ["the"]:  # sentinel stop flushes the last run
            stop = w in sw or not re.match(r"^[a-z][a-z0-9-]*$", w)
            if stop:
                if run:
                    occurrences.append(tuple(run[:max_phrase]))
                    run = []
            else:
                run.append(w)
    freq = Counter()
    deg = Counter()
    for ph in occurrences:
        for w in ph:
            freq[w] += 1
            deg[w] += len(ph)
    wscore = {w: int(round(deg[w] / freq[w] * 1e9)) for w in freq}
    per_type = {}
    occ_count = Counter(occurrences)
    for ph, cnt in occ_count.items():
        per_type[" ".join(ph)] = (
            len(ph), cnt, sum(wscore[w] for w in ph)
        )
    ordered = sorted(per_type, key=lambda p: (-per_type[p][2], p))[:topk]
    return {
        p: per_type[p] + (i + 1,) for i, p in enumerate(ordered)
    }


def test_rake_matches_python(spark):
    assert "the" in EN_STOPWORDS and "of" in EN_STOPWORDS
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "quick brown fox of the deep learning model zoo",
        "deep learning model training runs on the big cluster",
        "the model zoo",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["phrase"]: (
            r["n_words"], r["n_occurrences"], r["score_i9"], r["rnk"]
        )
        for r in rake_keyphrases(df).collect()
    }
    assert got == _python_rake(texts)
    assert any(n > 1 for n, _, _, _ in got.values()), "no multiword phrase"


def test_pra_hand_kb(spark):
    rows = [
        # x -born_in-> y -capital_of-> z, and the direct x -citizen-> z
        ("x", "born_in", "y"), ("y", "capital_of", "z"),
        ("x", "citizen", "z"),
        # unlabeled pair via two mids (path diversity)
        ("a", "p", "m1"), ("m1", "q", "b"),
        ("a", "p", "m2"), ("m2", "q", "b"),
        # cycle: c -r-> d -r-> c (excluded from features)
        ("c", "r", "d"), ("d", "r", "c"),
    ]
    df = spark.createDataFrame(
        [(s, p, o, "T", "T", 1, 1, s, o) for s, p, o in rows],
        "subj_id string, pred string, obj_id string, subj_type string,"
        " obj_type string, n_support long, n_docs long,"
        " subj_repr string, obj_repr string",
    )
    got = {
        (r["a_id"], r["c_id"], r["pred_ab"], r["pred_bc"]): (
            r["n_paths"], r["n_mids"], r["known_link"], r["direct_pred"]
        )
        for r in pra_features(df, max_mid_degree=10).collect()
    }
    assert got[("x", "z", "born_in", "capital_of")] == (1, 1, 1, "citizen")
    assert got[("a", "b", "p", "q")] == (2, 2, 0, "")
    # cycles excluded: no (c, c) or (d, d) rows
    assert all(a != c for (a, c, _, _) in got)
    # chained via the direct edge: x -citizen-> z exists, z has no
    # out-edges, so no spurious extra types
    assert len(got) == 2
