"""Property tests for the typing math invariants (SURVEY §5.2)."""

from hypothesis import given
from hypothesis import strategies as st

from unsupervised_ner_spark.kernel import typing as T

EMAP = {
    "DISEASE": "DISEASE", "DRUG": "THERAPEUTIC_OR_PREVENTIVE_PROCEDURE",
    "PERSON": "PERSON", "NUMBER": "MEASURE",
    "OTHER": "OTHER", "UNTAGGED_ENTITY": "UNTAGGED_ENTITY",
}
LABELS = ["DISEASE", "DRUG", "PERSON", "NUMBER", "OTHER", "UNTAGGED_ENTITY"]


@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0.01, max_value=20.0, allow_nan=False),
            st.lists(
                st.tuples(st.sampled_from(LABELS), st.integers(1, 30)),
                min_size=1, max_size=4,
            ),
        ),
        min_size=1, max_size=8,
    )
)
def test_aggregate_invariants(descs_spec):
    descs = [(f"d{i}", score) for i, (score, _) in enumerate(descs_spec)]
    sigs = [
        ([l for l, _ in labels], [c for _, c in labels])
        for _, labels in descs_spec
    ]
    ents, confs, subtypes = T.aggregate_entities(descs, sigs, EMAP)
    # distribution: sorted desc, sums to ~1 (4dp rounding slack)
    assert len(ents) == len(confs)
    assert confs == sorted(confs, reverse=True)
    assert abs(sum(confs) - 1.0) < 1e-2
    # decorated entities parse back to known groups
    for e in ents:
        grp = e.split("[")[0]
        assert grp in set(EMAP.values())
    # suppressed labels never appear as subtypes
    for grp, subs in subtypes.items():
        for label in subs:
            if grp != "OTHER":
                assert label not in ("OTHER", "UNTAGGED_ENTITY")


@given(
    st.lists(st.tuples(st.sampled_from(["A", "B", "C"]), st.floats(0.0, 1.0)), max_size=3),
    st.lists(st.tuples(st.sampled_from(["A", "B", "D"]), st.floats(0.0, 1.0)), max_size=3),
    st.booleans(),
)
def test_pool_invariants(ci, cs, blank):
    ci = list(dict(ci).items())  # dedupe classes like the upstream dists do
    cs = list(dict(cs).items())
    pooled = T.pool_confidences(
        [e for e, _ in ci], [c for _, c in ci], {e: {e: 1} for e, _ in ci},
        [e for e, _ in cs], [c for _, c in cs], {e: {e: 1} for e, _ in cs},
        blank_probe=blank,
    )
    confs = [c for _, c, _ in pooled]
    assert confs == sorted(confs, reverse=True)
    if confs:
        assert abs(sum(confs) - 1.0) < 1e-2
    if blank:
        # CI-only classes cannot appear for blank probes
        cs_classes = {e for e, _ in cs}
        assert all(e in cs_classes for e, _, _ in pooled)
