"""FD discovery (curation.fd_audit) and correlated-sample join
cardinality estimation (layout.join_estimate) tests."""

import hashlib

from unsupervised_ner_spark.ops.curation import fd_audit
from unsupervised_ner_spark.ops.layout import join_estimate


def test_fd_audit_verdicts_and_counts(spark):
    # b = a % 2 (true FD a->b); c breaks every FD onto it except from a
    # where a=1 maps to both 10 and 11
    rows = [(1, 1, 10), (1, 1, 11), (2, 0, 10), (3, 1, 10), (4, 0, 12)]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    out = {(r.lhs, r.rhs): r for r in fd_audit(df, ["a", "b", "c"]).collect()}
    assert len(out) == 6
    ab = out[("a", "b")]
    assert ab.is_fd == 1 and ab.n_lhs_values == 4 and ab.n_pairs == 4
    ac = out[("a", "c")]
    assert ac.is_fd == 0 and ac.n_violating_lhs == 1
    assert ac.violation_ppm == 250_000
    # b -> a massively violating: b=1 -> {1,3}, b=0 -> {2,4}
    ba = out[("b", "a")]
    assert (ba.n_lhs_values, ba.n_pairs, ba.n_violating_lhs) == (2, 4, 2)
    assert ba.violation_ppm == 1_000_000
    # c -> a: c=10 -> {1,2,3} violates; c=11,12 fine
    ca = out[("c", "a")]
    assert (ca.n_violating_lhs, ca.is_fd) == (1, 0)


def test_join_estimate_exact_python_reference(spark):
    left = spark.createDataFrame(
        [(k,) for k in range(40) for _ in range(k % 3 + 1)], "k long"
    )
    right = spark.createDataFrame(
        [(k,) for k in range(20, 60) for _ in range(2)], "k long"
    )
    r = join_estimate(left, right, "k", "k", rate_mod=4).collect()[0]
    # python reference
    lc = {k: k % 3 + 1 for k in range(40)}
    rc = {k: 2 for k in range(20, 60)}
    both = sorted(set(lc) & set(rc))
    exact = sum(lc[k] * rc[k] for k in both)
    sampled = [
        k for k in both
        if int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % 4 == 0
    ]
    est = 4 * sum(lc[k] * rc[k] for k in sampled)
    assert r.n_keys_both == len(both)
    assert r.exact_rows == exact
    assert r.n_sample_keys == len(sampled)
    assert r.est_rows == est
    assert r.err_sign == (1 if est >= exact else -1)
    assert r.err_ppm == abs(est - exact) * 1_000_000 // exact


def test_join_estimate_empty_sample_is_zero_not_null(spark):
    # rate_mod large enough that no key samples: est = 0, sign -1
    left = spark.createDataFrame([(1,), (2,)], "k long")
    right = spark.createDataFrame([(1,), (2,)], "k long")
    hits = [
        k for k in (1, 2)
        if int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % 997 == 0
    ]
    assert not hits  # md5 of '1'/'2' do not land on residue 0 mod 997
    r = join_estimate(left, right, "k", "k", rate_mod=997).collect()[0]
    assert (r.est_rows, r.n_sample_keys, r.err_sign, r.err_ppm) == (
        0, 0, -1, 1_000_000,
    )
