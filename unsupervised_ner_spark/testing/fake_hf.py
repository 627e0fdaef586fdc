"""Minimal numpy-backed stand-ins for torch + a HuggingFace masked-LM,
exercising EXACTLY the surface ``HFBertDescriptorProvider`` uses
(descriptors.py): tokenizer(texts, return_tensors/padding/truncation/
max_length) -> enc dict, ``enc["input_ids"][i] == mask_token_id`` ->
``.nonzero()``, ``model(**enc).logits`` indexing, ``torch.topk``,
``torch.no_grad``, ``convert_ids_to_tokens``.

The fake logits are a deterministic function of (masked position's left
context token id, vocab id), so tests can independently compute the
expected top-k. Lives inside the package (not tests/) so Spark executor
workers can import the provider factory by module reference.
"""

from __future__ import annotations

import contextlib

import numpy as np

PAD, CLS, SEP, MASK, UNK = 0, 1, 2, 3, 4
_SPECIALS = {"[PAD]": PAD, "[CLS]": CLS, "[SEP]": SEP, "[MASK]": MASK, "[UNK]": UNK}
VOCAB_WORDS = [
    "drug", "medication", "disease", "disorder", "condition", "city",
    "person", "scientist", "protein", "gene", "compound", "treatment",
    "symptom", "place", "company", "number",
]
VOCAB = {**_SPECIALS, **{w: i + len(_SPECIALS) for i, w in enumerate(VOCAB_WORDS)}}
ID2TOK = {i: t for t, i in VOCAB.items()}
VOCAB_SIZE = 256  # ids beyond the word list exist but are never top-k winners


class FakeTensor:
    def __init__(self, arr):
        self.arr = np.asarray(arr)

    def __eq__(self, other):  # noqa: D105 - elementwise, torch-style
        return FakeTensor(self.arr == other)

    def nonzero(self):
        idx = np.nonzero(self.arr)[0]
        return [FakeTensor(np.array([i])) for i in idx]

    def __getitem__(self, key):
        if isinstance(key, tuple):
            out = self.arr
            for k in key:
                out = out[int(k) if isinstance(k, (int, np.integer)) else k]
            return FakeTensor(out)
        return FakeTensor(self.arr[key])

    def __int__(self):
        return int(self.arr.reshape(-1)[0])

    def __float__(self):
        return float(self.arr.reshape(-1)[0])

    def __len__(self):
        return len(self.arr)

    def __iter__(self):
        return (FakeTensor(x) for x in self.arr)


class _Enc(dict):
    def to(self, device):
        return self


class FakeTokenizer:
    mask_token = "[MASK]"
    mask_token_id = MASK

    def _ids(self, text: str) -> list[int]:
        ids = [CLS]
        for w in text.split():
            ids.append(VOCAB.get(w, VOCAB.get(w.lower(), UNK)))
        ids.append(SEP)
        return ids

    def __call__(self, texts, return_tensors=None, padding=True,
                 truncation=True, max_length=128):
        rows = [self._ids(t)[:max_length] for t in texts]
        width = max(len(r) for r in rows)
        mat = np.full((len(rows), width), PAD, dtype=np.int64)
        for i, r in enumerate(rows):
            mat[i, : len(r)] = r
        return _Enc(input_ids=FakeTensor(mat))

    def convert_ids_to_tokens(self, i: int) -> str:
        return ID2TOK.get(int(i), f"tok{int(i)}")


def expected_logits_row(left_context_id: int) -> np.ndarray:
    """The fake MLM's logits at a masked position: a deterministic function
    of the token id immediately LEFT of the mask (so tests can recompute).
    """
    v = np.arange(VOCAB_SIZE)
    raw = (v * 2654435761 + left_context_id * 97) % 1009
    # word-list ids get a large boost so winners are real tokens, not tokN
    boost = np.zeros(VOCAB_SIZE)
    boost[len(_SPECIALS) : len(_SPECIALS) + len(VOCAB_WORDS)] = 2000
    return (raw + boost).astype(np.float64)


class _Out:
    def __init__(self, logits):
        self.logits = logits


class FakeMaskedLM:
    def to(self, device):
        return self

    def eval(self):
        return self

    def __call__(self, input_ids=None, **_):
        ids = input_ids.arr
        n, width = ids.shape
        logits = np.zeros((n, width, VOCAB_SIZE))
        for i in range(n):
            for j in range(width):
                left = ids[i, j - 1] if j > 0 else CLS
                logits[i, j] = expected_logits_row(int(left))
        return _Out(FakeTensor(logits))


class FakeTorch:
    class cuda:  # noqa: N801 - mimics torch.cuda
        @staticmethod
        def is_available():
            return False

    @staticmethod
    @contextlib.contextmanager
    def no_grad():
        yield

    class _TopK:
        def __init__(self, values, indices):
            self.values = values
            self.indices = indices

    @staticmethod
    def topk(row: FakeTensor, k: int):
        arr = row.arr
        idx = np.argsort(-arr, kind="stable")[:k]
        return FakeTorch._TopK(
            [FakeTensor(np.array([arr[i]])) for i in idx],
            [FakeTensor(np.array([i])) for i in idx],
        )


def fake_hf_provider():
    """provider_factory for tag_sentences: the real HFBertDescriptorProvider
    wired to the fakes — module-level so Spark workers resolve it by
    reference."""
    from unsupervised_ner_spark.descriptors import HFBertDescriptorProvider

    return HFBertDescriptorProvider(
        torch_mod=FakeTorch, tokenizer=FakeTokenizer(), model=FakeMaskedLM()
    )
