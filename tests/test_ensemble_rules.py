"""Exhaustive case-table test of the two-server resolution maze
(pipeline/ensemble_rules.py) — one row per reachable branch of
ensemble/aggregate_server_json.py get_conflict_resolved_entity +
pick_single_server_if_possible (live arm) + gen_resolved_entity
(SURVEY.md §7.4 item 4).

Expectations are hand-derived from the reference decision procedure, not
from the implementation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from unsupervised_ner_spark.pipeline import ensemble_rules as R

BIO_PREC = ["DISEASE", "DRUG", "GENE"]
PHI_PREC = ["NAME", "ORG"]
COMMON = ["PERSON", "LOCATION"]

DIST = T.ArrayType(
    T.StructType(
        [T.StructField("e", T.StringType()), T.StructField("conf", T.DoubleType())]
    )
)
SCHEMA = T.StructType(
    [
        T.StructField("case_id", T.StringType()),
        T.StructField("pred_a", T.StringType()),
        T.StructField("conf_a", T.DoubleType()),
        T.StructField("cs_a", DIST),
        T.StructField("ci_a", DIST),
        T.StructField("pred_b", T.StringType()),
        T.StructField("conf_b", T.DoubleType()),
        T.StructField("cs_b", DIST),
        T.StructField("ci_b", DIST),
        T.StructField("expected", T.StringType()),
    ]
)


def d(*pairs):
    return [{"e": e, "conf": c} for e, c in pairs]


# defaults: a trivially self-consistent side (chain collapses to flip(pred))
A_TRIV = dict(pred_a="DISEASE[MENTAL]", conf_a=0.9,
              cs_a=d(("DISEASE[MENTAL]", 1.0)), ci_a=d(("DISEASE[MENTAL]", 1.0)))
B_TRIV = dict(pred_b="NAME[FIRST]", conf_b=0.8,
              cs_b=d(("NAME[FIRST]", 1.0)), ci_b=d(("NAME[FIRST]", 1.0)))
B_OTHER = dict(pred_b="OTHER", conf_b=1.0, cs_b=d(("OTHER", 1.0)), ci_b=d(("OTHER", 1.0)))
A_OTHER = dict(pred_a="OTHER", conf_a=1.0, cs_a=d(("OTHER", 1.0)), ci_a=d(("OTHER", 1.0)))


def case(case_id, expected, **kw):
    row = {**A_TRIV, **B_TRIV, "case_id": case_id, "expected": expected}
    row.update(kw)
    return row


CASES = [
    # --- layer 1: agreement (:86-90) ---
    # L1a: agreement on a bio-precedence base -> server A, whose chain is
    # trivial -> flip(pred_a)
    case("L1a_agree_bio_owner", "MENTAL[DISEASE]",
         pred_b="DISEASE[MENTAL]", cs_b=d(("DISEASE[MENTAL]", 1.0)),
         ci_b=d(("DISEASE[MENTAL]", 1.0))),
    # L1b: agreement on a base NOT in bio precedence (common PERSON) ->
    # server B chain (trivial) -> flip(pred_b) = PERSON (undecorated)
    case("L1b_agree_phi_owner", "PERSON",
         pred_a="PERSON", cs_a=d(("PERSON", 1.0)), ci_a=d(("PERSON", 1.0)),
         pred_b="PERSON", cs_b=d(("PERSON", 1.0)), ci_b=d(("PERSON", 1.0))),
    # --- layer 1: O backoff (:93-98) ---
    case("L1c_b_other", "MENTAL[DISEASE]", **B_OTHER),
    case("L1d_a_other", "FIRST[NAME]", **A_OTHER),
    # --- layer 1: exactly one server cross-predicting (:186-189) ---
    # A's above-mean CS contains NAME (outside bio prec+common) -> drop A
    case("L1e_a_crosses", "FIRST[NAME]",
         pred_a="DISEASE", cs_a=d(("NAME", 0.6), ("DISEASE", 0.4)),
         ci_a=d(("DISEASE", 1.0))),
    # B's above-mean CS contains DRUG (outside phi prec+common) -> drop B
    case("L1f_b_crosses", "MENTAL[DISEASE]",
         pred_b="NAME", cs_b=d(("DRUG", 0.6), ("NAME", 0.4)),
         ci_b=d(("NAME", 1.0))),
    # --- layer 1: both/neither crossing -> dual, higher conf first (:174-185) ---
    case("L1g_both_cross_dual", "MENTAL[DISEASE]/FIRST[NAME]",
         conf_a=0.9, conf_b=0.5,
         cs_a=d(("ORG", 1.0)), cs_b=d(("GENE", 1.0))),
    case("L1h_neither_cross_dual_b_first", "FIRST[NAME]/MENTAL[DISEASE]",
         conf_a=0.5, conf_b=0.9),
    # --- layer 2 chain (gen_resolved_entity :238-325), routed via B=OTHER ---
    # C1: consolidated != CS top -> flip(pred)/flip(cs0) (:251-260)
    case("C1_consolidated_ne_cs", "MENTAL[DISEASE]/ASPIRIN[DRUG]",
         cs_a=d(("DRUG[ASPIRIN]", 0.7), ("DISEASE[MENTAL]", 0.3)),
         ci_a=d(("DISEASE[MENTAL]", 1.0)), **B_OTHER),
    # C2: CS == consolidated, CI differs and CI in precedence ->
    # flip(cs0)/flip(ci0) (:263-273)
    case("C2_ci_backoff", "MENTAL[DISEASE]/G1[GENE]",
         cs_a=d(("DISEASE[MENTAL]", 1.0)), ci_a=d(("GENE[G1]", 1.0)), **B_OTHER),
    # C3: CI differs but NOT in precedence (PERSON is common, not precedence),
    # second CS is above-mean AND packed bare -> flip(cs0)/flip(cs1) (:276-296)
    case("C3_second_cs", "MENTAL[DISEASE]/DRUG",
         cs_a=d(("DISEASE[MENTAL]", 0.5), ("DRUG", 0.5)),
         ci_a=d(("PERSON", 1.0)), **B_OTHER),
    # C4: same but second CS packed DECORATED -> the check_if_entity_in_arr
    # bare-equality quirk rejects it -> flip(pred) (:231-235 quirk)
    case("C4_second_cs_decorated_quirk", "MENTAL[DISEASE]",
         cs_a=d(("DISEASE[MENTAL]", 0.5), ("DRUG[ASPIRIN]", 0.5)),
         ci_a=d(("PERSON", 1.0)), **B_OTHER),
    # C5: second CS bare but BELOW mean -> flip(pred)
    case("C5_second_cs_below_mean", "MENTAL[DISEASE]",
         cs_a=d(("DISEASE[MENTAL]", 0.8), ("DRUG", 0.2)),
         ci_a=d(("PERSON", 1.0)), **B_OTHER),
    # C6: CS == CI == consolidated, second CS qualifies -> flip(cs0)/flip(cs1)
    # (:300-320)
    case("C6_cs_eq_ci_second_cs", "MENTAL[DISEASE]/GENE",
         cs_a=d(("DISEASE[MENTAL]", 0.5), ("GENE", 0.5)),
         ci_a=d(("DISEASE[MENTAL]", 1.0)), **B_OTHER),
    # C7: CS == CI, single-entry CS -> flip(pred) (:321-325)
    case("C7_trivial_flip", "MENTAL[DISEASE]", **B_OTHER),
    # C8: EMPTY CS distribution -> cs0 falls back to CI top (:240-242);
    # here CI top == consolidated -> chain collapses to flip(pred)
    case("C8_empty_cs_fallback", "MENTAL[DISEASE]",
         cs_a=d(), ci_a=d(("DISEASE[MENTAL]", 1.0)), **B_OTHER),
    # C9: undecorated prediction flips to itself
    case("C9_flip_bare", "DISEASE",
         pred_a="DISEASE", cs_a=d(("DISEASE", 1.0)), ci_a=d(("DISEASE", 1.0)),
         **B_OTHER),
]


@pytest.fixture(scope="module")
def resolved(spark):
    df = spark.createDataFrame([tuple(c[f.name] for f in SCHEMA) for c in CASES], SCHEMA)
    lit_arr = lambda xs: F.array(*[F.lit(x) for x in xs])  # noqa: E731
    out = df.select(
        "case_id", "expected",
        R.resolve_expr(
            F.col("pred_a"), F.col("conf_a"), F.col("cs_a"), F.col("ci_a"),
            F.col("pred_b"), F.col("conf_b"), F.col("cs_b"), F.col("ci_b"),
            bio_prec=lit_arr(BIO_PREC), bio_ok=lit_arr(BIO_PREC + COMMON),
            phi_prec=lit_arr(PHI_PREC), phi_ok=lit_arr(PHI_PREC + COMMON),
        ).alias("resolution"),
    )
    return {r.case_id: (r.resolution, r.expected) for r in out.collect()}


@pytest.mark.parametrize("case_id", [c["case_id"] for c in CASES])
def test_resolution_branch(resolved, case_id):
    got, expected = resolved[case_id]
    assert got == expected, f"{case_id}: got {got!r}, expected {expected!r}"
