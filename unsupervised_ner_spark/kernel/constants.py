"""Semantic constants replicated from the reference (cited per item).

Reference: /root/reference (ajitrajasekharan/unsupervised_NER, v1 snapshot).
"""

# POS tags whose maximal runs form one mention span
# (ensemble/utils/common.py:11)
NOUN_TAGS = ("NFP", "JJ", "NN", "FW", "NNS", "NNPS", "JJS", "JJR", "NNP", "POS", "CD")

# POS tags whose words get first-letter capitalization (ensemble/utils/common.py:12)
CAP_TAGS = ("NFP", "JJ", "NN", "FW", "NNS", "NNPS", "JJS", "JJR", "NNP", "PRP")

# Mask markers (ensemble/utils/common.py:6-8; batched_main_NER.py:24)
MASK_TAG = "__entity__"
INPUT_MASK_TAG = ":__entity__"
RESET_POS_TAG = "RESET"

# Context-independent probe template — grammatically wrong ("a entity") on
# purpose; byte compatibility matters for MLM outputs (batched_main_NER.py:339)
CI_TEMPLATE = "%s is a entity"

# Labels suppressed when SUPPRESS_UNTAGGED=1 (batched_main_NER.py:680-683,
# config.json:6)
OTHER_LABEL = "OTHER"
UNTAGGED_LABEL = "UNTAGGED_ENTITY"

# Top-k descriptors per masked position; k observable via the dummy-descriptor
# shortcut (main_NER.py:19 DUMMY_DESCS=10)
TOP_K_DESCS = 10

# Numeric-mention shortcut: integer spans skip the MLM and get 10 dummy
# ("two", 0) descriptor pairs (main_NER.py:486-496)
DUMMY_DESC_TERM = "two"

# Sentence terminators for punct-termination (ensemble/aggregate_server_json.py:41)
END_TOKENS = "!,.:;?"
