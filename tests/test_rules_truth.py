"""apply_rules forward chaining on a hand KB; truth_discovery on a
hand claim set with a reliability-driven flip."""

from __future__ import annotations

from unsupervised_ner_spark.pipeline.triples import (
    apply_rules,
    truth_discovery,
)


def test_apply_rules_hand_kb(spark):
    # knows(x,y) holds for 3 pairs; trusts(x,y) co-occurs on 2 of them
    # (fwd rule knows=>trusts at 666666 ppm) and liked_by(y,x) on 2
    # (inv rule knows=>liked_by at 666666 ppm). One pair (a3,b3) has
    # knows only — both rules should predict its missing facts.
    rows = [
        ("a1", "knows", "b1"), ("a1", "trusts", "b1"),
        ("b1", "liked_by", "a1"),
        ("a2", "knows", "b2"), ("a2", "trusts", "b2"),
        ("b2", "liked_by", "a2"),
        ("a3", "knows", "b3"),
        # noise predicate with no co-occurrence: no rule
        ("a1", "near", "z9"),
    ]
    df = spark.createDataFrame(rows, "subj string, pred_norm string, obj string")
    got = {
        (r["subj"], r["pred_norm"], r["obj"]): (
            r["n_rules"], r["max_conf_ppm"], r["src_preds"]
        )
        for r in apply_rules(df, min_conf_ppm=600000, min_joint=2).collect()
    }
    # knows(a3,b3) => trusts(a3,b3) [fwd] and liked_by(b3,a3) [inv]
    assert got[("a3", "trusts", "b3")] == (1, 666666, "knows")
    assert got[("b3", "liked_by", "a3")] == (1, 666666, "knows")
    # nothing already known is re-proposed, no near-based candidates
    assert all(p in ("trusts", "liked_by") for (_, p, _) in got)
    # trusts=>knows holds at conf 1.0 (2/2) but n_joint filter keeps it;
    # it proposes nothing new (every trusts pair already knows) — and
    # liked_by=>knows-inv likewise; so exactly the two a3/b3 rows remain
    assert len(got) == 2


def test_apply_rules_thresholds(spark):
    # same KB, but min_joint=3 kills every rule (max joint support is 2)
    rows = [
        ("a1", "knows", "b1"), ("a1", "trusts", "b1"),
        ("a2", "knows", "b2"), ("a2", "trusts", "b2"),
        ("a3", "knows", "b3"),
    ]
    df = spark.createDataFrame(rows, "subj string, pred_norm string, obj string")
    assert apply_rules(df, min_conf_ppm=0, min_joint=3).count() == 0


def test_truth_discovery_flip(spark):
    # sources r1, r2 are right everywhere; u1, u2, u3 lie on k0/k2.
    # On k1 only {r1, r2, u1, u2, u3} claim: the naive majority is the
    # lie (3 vs 2), but quality weighting flips it back to the truth.
    claims = []
    for k in ("k0", "k2"):
        for s in ("r1", "r2"):
            claims.append((s, k, "capital_of", "t" + k))
        for s in ("u1", "u2", "u3"):
            claims.append((s, k, "capital_of", "f" + k))
    # k0/k2 also get 5 more honest observers so the majority is the truth
    for k in ("k0", "k2"):
        for s in ("h1", "h2", "h3", "h4", "h5"):
            claims.append((s, k, "capital_of", "t" + k))
    for s in ("r1", "r2"):
        claims.append((s, "k1", "capital_of", "tk1"))
    for s in ("u1", "u2", "u3"):
        claims.append((s, "k1", "capital_of", "fk1"))
    df = spark.createDataFrame(
        claims, "src string, subj string, pred_norm string, obj string"
    )
    got = {
        r["subj"]: (
            r["obj"], r["n_sources"], r["score_sum"], r["majority_obj"],
            r["changed"],
        )
        for r in truth_discovery(df).collect()
    }
    # quality: r1/r2 = 3/3 claims agree = 1e6? No: on k1 the naive
    # majority is fk1, so r1/r2 agree on 2/3 -> 666666; u1-3 agree only
    # on k1 -> 1/3 -> 333333; h* -> 2/2 -> 1e6.
    # k1 re-vote: tk1 = 2*666666 = 1333332 > fk1 = 3*333333 = 999999.
    assert got["k1"] == ("tk1", 2, 1333332, "fk1", 1)
    assert got["k0"][0] == "tk0" and got["k0"][4] == 0
    # k0 score: 2*666666 + 5*1000000 = 6333332 over 7 sources
    assert got["k0"][1:3] == (7, 6333332)
