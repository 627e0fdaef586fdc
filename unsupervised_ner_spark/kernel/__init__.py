"""Pure-Python reference-semantics kernels (no Spark imports here).

These implement, from scratch, the *observable semantics* of the reference's
v2 batched pipeline (``/root/reference/batched_main_NER.py``) so that the
distributed Spark pipeline and the single-process parity oracle share one
bit-identical math core.
"""

from unsupervised_ner_spark.kernel.constants import (  # noqa: F401
    CAP_TAGS,
    CI_TEMPLATE,
    INPUT_MASK_TAG,
    MASK_TAG,
    NOUN_TAGS,
    OTHER_LABEL,
    RESET_POS_TAG,
    UNTAGGED_LABEL,
)
