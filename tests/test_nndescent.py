"""NN-Descent round (simsearch.nn_descent_round) tests: exact python
replication on a deterministic corpus, plus the bucket-cap gate."""

import hashlib

import numpy as np

from unsupervised_ner_spark.ops.simsearch import nn_descent_round, srp_signs


def _vecs(n, dim=64):
    rs = np.random.RandomState(7)
    return [rs.normal(size=dim).astype(np.float32) for _ in range(n)]


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def _seq_dot(a, b):
    # Spark's F.aggregate and DuckDB's list_dot_product sum sequentially;
    # np.dot's pairwise order can differ in the last ulp, so replicate
    # the engine's exact summation.
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _ref(vecs, k, nbits=8, cap=50):
    signs = srp_signs(nbits, 64)
    dbl = [[float(x) for x in v] for v in vecs]

    def cos(i, j):
        return round(
            _seq_dot(dbl[i], dbl[j])
            / (
                (_seq_dot(dbl[i], dbl[i]) ** 0.5)
                * (_seq_dot(dbl[j], dbl[j]) ** 0.5)
            ),
            9,
        )

    buckets = []
    for v in dbl:
        b = 0
        for bit, s in enumerate(signs):
            if round(_seq_dot(v, s), 9) >= 0:
                b |= 1 << bit
        buckets.append(b)
    # capped members per bucket in md5 order
    members = {}
    for i, b in enumerate(buckets):
        members.setdefault(b, []).append(i)
    for b in members:
        members[b].sort(
            key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
        )
        members[b] = members[b][:cap]

    def topk(cand_by_u):
        out = {}
        for u, cs in cand_by_u.items():
            ranked = sorted(cs, key=lambda w: (-cos(u, w), w))[:k]
            out[u] = ranked
        return out

    init_cand = {}
    for u, b in enumerate(buckets):
        probe = [b] + [b ^ (1 << j) for j in range(nbits)]
        cs = {
            w for p in probe for w in members.get(p, []) if w != u
        }
        init_cand[u] = cs
    init = topk(init_cand)
    und = {}
    for u, ws in init.items():
        for w in ws:
            und.setdefault(u, set()).add(w)
            und.setdefault(w, set()).add(u)
    cand = {u: set(ws) for u, ws in init.items()}
    for center, nbrs in und.items():
        for n1 in nbrs:
            cand.setdefault(n1, set()).add(center)
            for n2 in nbrs:
                if n1 != n2:
                    cand[n1].add(n2)
    final = topk(cand)
    return init, final


def test_nn_descent_matches_python_replication(spark):
    vecs = _vecs(40)
    init, final = _ref(vecs, k=3)
    out = nn_descent_round(_emb(spark, vecs), k=3).collect()
    got = {}
    for r in out:
        got.setdefault(r.node_id, []).append((r.rank, r.neighbor_id, r.is_new))
    for u, lst in got.items():
        lst.sort()
        assert [w for _, w, _ in lst] == final[u], f"node {u}"
        for _, w, is_new in lst:
            assert is_new == (0 if w in init[u] else 1)
    # nodes whose probe ball is empty and that nobody lists are isolated:
    # the engine emits no rows for them, the reference an empty list
    assert set(got) == {u for u, lst in final.items() if lst}
    # the round must genuinely discover edges on this corpus
    assert any(r.is_new == 1 for r in out)


def test_nn_descent_bucket_cap_gates_init_membership(spark):
    # all-identical vectors share one bucket; cap=2 keeps only the two
    # md5-smallest members eligible for INIT edges (is_new=0). The
    # local-join may then legitimately reach past the cap — those edges
    # must carry is_new=1 (that's the round doing its job).
    vecs = [np.ones(64, dtype=np.float32) for _ in range(6)]
    out = nn_descent_round(_emb(spark, vecs), k=5, bucket_cap=2).collect()
    capped = sorted(
        range(6), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )[:2]
    assert out
    for r in out:
        if r.is_new == 0:
            assert r.neighbor_id in capped
        assert r.cos_mil == 1000  # identical vectors: cosine exactly 1
    assert any(r.is_new == 1 for r in out)
