"""ANF / HyperBall neighborhood sketches (pipeline/er.py anf_registers)
vs an exact Python md5 replication, and the ComplEx KGE eval branch
(ops/kgtrain.py kge_eval score_fn="complex") vs its Python replication."""

import hashlib

from unsupervised_ner_spark.ops import kgtrain
from unsupervised_ner_spark.pipeline import er


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, "E", b, "E", 1, 1) for a, b in pairs],
        "ent_a string, type_a string, ent_b string, type_b string, "
        "n_sents long, n_docs long",
    )


def _reg(key: str) -> tuple[str, int]:
    """(bucket, rho) of a node key — the ops/sketches md5 construction
    with a 1-hex-char bucket."""
    h = hashlib.md5(key.encode()).hexdigest()
    bucket, s = h[0], h[1:13]
    lz = len(s) - len(s.lstrip("0"))
    if lz == 12:
        return bucket, 49
    d = s[lz]
    extra = 3 if d == "1" else 2 if d in "23" else 1 if d in "4567" else 0
    return bucket, lz * 4 + extra + 1


def _anf_py(pairs, rounds):
    adj: dict[str, set] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    regs = {v: {} for v in adj}
    for v in adj:
        b, r = _reg(f"{v}|E")
        regs[v][b] = r
    out = {}

    def snap(radius):
        for v, m in regs.items():
            out[(v, radius)] = (
                len(m), sum(1 << (49 - r) for r in m.values())
            )

    snap(0)
    for radius in range(1, rounds + 1):
        new = {v: dict(m) for v, m in regs.items()}
        for v in adj:
            for u in adj[v]:
                for b, r in regs[u].items():
                    if new[v].get(b, 0) < r:
                        new[v][b] = r
        regs = new
        snap(radius)
    return out


def test_anf_matches_python_replication(spark):
    # path + hub + a separate triangle: varied ball growth rates
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
             ("h", "a"), ("h", "c"), ("x", "y"), ("y", "z"), ("x", "z")]
    got = {
        (r.ent, r.radius): (r.n_present, r.sum_pow)
        for r in er.anf_registers(_edges(spark, pairs), rounds=2).collect()
    }
    assert got == _anf_py(pairs, 2)


def test_anf_monotone_and_radius0(spark):
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    rows = er.anf_registers(_edges(spark, pairs), rounds=2).collect()
    by_node: dict[str, dict[int, tuple]] = {}
    for r in rows:
        by_node.setdefault(r.ent, {})[r.radius] = (r.n_present, r.sum_pow)
    for ent, radii in by_node.items():
        assert set(radii) == {0, 1, 2}
        assert radii[0][0] == 1  # radius 0: exactly the node's own register
        # registers only max-merge: occupied count never decreases
        assert radii[0][0] <= radii[1][0] <= radii[2][0]


def test_anf_estimate_tracks_ball_size(spark):
    # 6-clique: the radius-1 ball is the whole graph for every node —
    # estimate must be within the documented ~26% rse band (3 sigma)
    nodes = [f"n{i}" for i in range(6)]
    pairs = [(a, b) for i, a in enumerate(nodes) for b in nodes[i + 1:]]
    est = {
        (r.ent, r.radius): r.estimate
        for r in er.anf_estimate(
            er.anf_registers(_edges(spark, pairs), rounds=1)
        ).collect()
    }
    for n in nodes:
        assert 1.0 <= est[(n, 0)] <= 3.0
        assert 2.0 <= est[(n, 1)] <= 18.0


# --- ComplEx -------------------------------------------------------------


def _md5_int32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _emb(prefix: str, v: str, dim=4, mod=1000):
    return [_md5_int32(f"{prefix}#{v}#{i}") % mod for i in range(dim)]


def _kge_py_complex(trips, dim=4, mod=1000):
    """Python replication of the ComplEx branch: negated
    Re(<w_r, e_s, conj(e_o)>) under the same filtered protocol."""
    dtrip = sorted(set(trips))
    vocab = sorted({(s, st) for s, st, p, o, ot in dtrip}
                   | {(o, ot) for s, st, p, o, ot in dtrip})
    truth = {(s, st, p, o, ot) for s, st, p, o, ot in dtrip}
    per_pred: dict[str, list] = {}
    for s, st, p, o, ot in dtrip:
        cands = [c for c, ct in vocab if ct == ot
                 and ((s, st, p, c, ot) not in truth or c == o)]

        def key(c):
            sr, si = _emb("er", s, dim, mod), _emb("ei", s, dim, mod)
            rr, ri = _emb("rr", p, dim, mod), _emb("ri", p, dim, mod)
            cr, ci = _emb("er", c, dim, mod), _emb("ei", c, dim, mod)
            score = sum(
                rr[i] * (sr[i] * cr[i] + si[i] * ci[i])
                + ri[i] * (sr[i] * ci[i] - si[i] * cr[i])
                for i in range(dim)
            )
            return (-score, c)

        order = sorted(cands, key=key)
        rank = order.index(o) + 1
        per_pred.setdefault(p, []).append((len(cands), rank))
    return {
        p: (len(xs), sum(n for n, _ in xs), sum(r for _, r in xs),
            sum(1 for _, r in xs if r <= 1), sum(1 for _, r in xs if r <= 3),
            sum(1 for _, r in xs if r <= 10))
        for p, xs in per_pred.items()
    }


def _trips(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, subj_type string, pred_norm string, "
              "obj string, obj_type string")


def test_kge_complex_matches_python_replication(spark):
    # same 5-candidate fixture as the DistMult test: measured ranks for
    # ("A","p","o0") are transe 3 / distmult 4 / complex 3 but the full
    # rank VECTORS of distmult and complex diverge on four of five test
    # triples — the asymmetric imaginary part genuinely reorders.
    rows = [("A", "S", "p", "o0", "T")] + [
        (f"B{j}", "S", "q", f"o{j}", "T") for j in range(4)
    ]
    exp = _kge_py_complex([tuple(r) for r in rows])
    got = {
        r.pred_norm: (r.n_test, r.n_cands, r.sum_rank, r.hits1, r.hits3,
                      r.hits10)
        for r in kgtrain.kge_eval(
            _trips(spark, rows), score_fn="complex"
        ).collect()
    }
    assert got == exp


def test_kge_complex_is_asymmetric():
    # the family's defining property: score(s, p, o) != score(o, p, s)
    # for generic embeddings (DistMult is symmetric by construction)
    def cx(s, p, o, dim=4, mod=1000):
        sr, si = _emb("er", s, dim, mod), _emb("ei", s, dim, mod)
        rr, ri = _emb("rr", p, dim, mod), _emb("ri", p, dim, mod)
        orr, oi = _emb("er", o, dim, mod), _emb("ei", o, dim, mod)
        return sum(
            rr[i] * (sr[i] * orr[i] + si[i] * oi[i])
            + ri[i] * (sr[i] * oi[i] - si[i] * orr[i])
            for i in range(4)
        )

    def dm(s, p, o, dim=4, mod=1000):
        es, ep, eo = _emb("e", s), _emb("r", p), _emb("e", o)
        return sum(es[i] * ep[i] * eo[i] for i in range(dim))

    assert cx("alice", "works", "acme") != cx("acme", "works", "alice")
    assert dm("alice", "works", "acme") == dm("acme", "works", "alice")
