"""The full two-server conflict-resolution maze as reusable Column algebra.

From-scratch re-expression of the COMPLETE decision procedure of
``/root/reference/ensemble/aggregate_server_json.py``:

- layer 1 — pick a server + cross-prediction count
  (``get_conflict_resolved_entity`` :77-110 and the live branch of
  ``pick_single_server_if_possible`` :112-190; the single-prediction
  branches :121-160 are DEAD CODE in the reference — the counters that
  would reach them are commented out at :125-127 — so only the
  "multiple predictions above mean" arm is live and replicated);
- layer 2 — emit the resolution string (``gen_resolved_entity`` :236-328),
  including the CS-vs-consolidated backoff, the CI backoff gated on
  CI ∈ precedence, the second-CS backoff with its
  ``check_if_entity_in_arr`` bare-string-equality quirk (:231-235 — a BASE
  class is compared against PACKED "MAIN[sub]" entries, so only entries
  packed bare can ever match; preserved verbatim), and the dual-label
  emission for cross_count == 2;
- ``flip_category`` (:482-491): "MAIN[SUB]" -> "SUB[MAIN]" applied to every
  emitted entity (the reference applies it on ALL exit paths).

Inputs per model side (suffix X): ``pred_X`` consolidated prediction
(un-prefixed "MAIN[SUB]" | "MAIN"), ``base_X`` its main class, ``conf_X``
pooled top confidence, ``cs_dist_X``/``ci_dist_X`` packed per-side
distributions (array<struct<e string, conf double>>, sorted conf desc) —
the orig_cs/orig_ci_prediction_details payloads (batched_main_NER.py:
287-309, pack_confidences :396-413).

Cross-prediction is detected on the CS-side distribution, NOT the pooled
one ("CS predictions are more reflective of cross over than consolidated
predictions, since CI may overwhelm CS", batched_main_NER.py:440), with
above-mean selection per ``get_predictions_above_threshold`` (:204-228:
mean of a probability distribution = 1/len; the list is sorted desc so the
above-mean set is a prefix).

The reference's span re-sync ("Picking min span length",
:84-88/get_span_info) is applied by the caller on the join keys (see
pipeline/ensemble.py resolve_ensemble).

"O" in the reference marks a no-entity server response; this engine's
analogue is the suppressed OTHER label.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

OTHER = "OTHER"


def base_of(e: Column) -> Column:
    """Main class of a (possibly decorated) entity string."""
    return F.split(e, r"\[")[0]


def flip_category(e: Column) -> Column:
    """flip_category (aggregate_server_json.py:482-491): "MAIN[SUB]" ->
    "SUB[MAIN]"; undecorated strings pass through. Prefix handling (:487)
    is not needed here — resolution runs pre-BIO, prefixes are re-derived
    downstream."""
    parts = F.split(e, r"\[")
    sub = F.regexp_replace(parts[1], r"\]$", "")
    return F.when(F.size(parts) > 1, F.concat(sub, F.lit("["), parts[0], F.lit("]"))).otherwise(e)


def above_mean(dist: Column) -> Column:
    """get_predictions_above_threshold (:204-228): entries with conf >= the
    distribution mean 1/len (desc-sorted => prefix). Empty dist -> empty."""
    n = F.size(dist)
    return F.filter(dist, lambda t: t["conf"] * n >= 1.0)


def is_cross_predicting(cs_dist: Column, ok_set: Column) -> Column:
    """is_included_in_server_entities (:519-526) negated: ANY above-mean
    CS-side prediction whose base falls outside precedence+common."""
    return F.exists(above_mean(cs_dist), lambda t: ~F.array_contains(ok_set, base_of(t["e"])))


def resolution_chain(
    pred: Column, cs_dist: Column, ci_dist: Column, prec_arr: Column
) -> Column:
    """gen_resolved_entity single-server branch (:238-325): the CS/CI/second-
    CS backoff chain for the picked server.

    ``prec_arr``: the picked server's PRECEDENCE list only (NOT + common) —
    the is_ci_included check at :248 uses precedence alone."""
    has_cs = F.size(cs_dist) > 0
    # empty CS distribution -> fall back to the CI top entry (:240-242)
    cs0 = F.when(has_cs, F.element_at(cs_dist, 1)["e"]).otherwise(
        F.element_at(ci_dist, 1)["e"]
    )
    ci0 = F.element_at(ci_dist, 1)["e"]
    m1 = base_of(cs0)
    m1_ci = base_of(ci0)
    m2 = base_of(pred)
    is_ci_included = F.array_contains(prec_arr, m1_ci)

    # second-CS backoff (:276-296/:300-320): requires >= 2 CS entries AND the
    # second entry's BASE to appear above-mean — compared against PACKED
    # entries with bare string equality (check_if_entity_in_arr quirk).
    cs1 = F.when(F.size(cs_dist) >= 2, F.element_at(cs_dist, 2)["e"])
    m2_cs = base_of(cs1)
    cs1_above = F.exists(above_mean(cs_dist), lambda t: t["e"] == m2_cs)
    second = F.when(
        (F.size(cs_dist) >= 2) & cs1_above,
        F.concat(flip_category(cs0), F.lit("/"), flip_category(cs1)),
    ).otherwise(flip_category(pred))

    return (
        # consolidated != CS top -> emit both (:251-260)
        F.when(m1 != m2, F.concat(flip_category(pred), F.lit("/"), flip_category(cs0)))
        # CS == consolidated, CI differs and is in-precedence -> CS/CI (:263-273)
        .when(
            (m1 != m1_ci) & is_ci_included,
            F.concat(flip_category(cs0), F.lit("/"), flip_category(ci0)),
        )
        # CI out-of-precedence OR CS == CI -> second-CS backoff (:274-325)
        .otherwise(second)
    )


def resolve_expr(
    pred_a: Column, conf_a: Column, cs_a: Column, ci_a: Column,
    pred_b: Column, conf_b: Column, cs_b: Column, ci_b: Column,
    bio_prec: Column, bio_ok: Column, phi_prec: Column, phi_ok: Column,
) -> Column:
    """Full resolution: layer-1 server pick + layer-2 emission."""
    base_a, base_b = base_of(pred_a), base_of(pred_b)
    cross_a = is_cross_predicting(cs_a, bio_ok)
    cross_b = is_cross_predicting(cs_b, phi_ok)

    chain_a = resolution_chain(pred_a, cs_a, ci_a, bio_prec)
    chain_b = resolution_chain(pred_b, cs_b, ci_b, phi_prec)

    # dual emission (cross_count == 2): higher-confidence server first
    # (pick_top_server_prediction :192-198; gen_resolved_entity :322-328)
    dual = F.when(
        conf_a >= conf_b,
        F.concat(flip_category(pred_a), F.lit("/"), flip_category(pred_b)),
    ).otherwise(F.concat(flip_category(pred_b), F.lit("/"), flip_category(pred_a)))

    return (
        # agreement -> precedence owner, then its single-server chain (:86-90)
        F.when(
            base_a == base_b,
            F.when(F.array_contains(bio_prec, base_a), chain_a).otherwise(chain_b),
        )
        # one side O/OTHER -> the other side's chain (:93-98)
        .when(base_b == OTHER, chain_a)
        .when(base_a == OTHER, chain_b)
        # exactly one side cross-predicting -> drop it (:186-189)
        .when(cross_a & ~cross_b, chain_b)
        .when(cross_b & ~cross_a, chain_a)
        # both or neither crossing -> dual label (:174-185)
        .otherwise(dual)
    )
