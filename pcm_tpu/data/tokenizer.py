"""Tokenizers for the text towers.

`HFTokenizer` wraps a local transformers tokenizer directory (CLIP BPE or T5
sentencepiece) when vocab files are available. `HashTokenizer` is the
offline fallback: deterministic token hashing with CLIP-style BOS/EOS
framing — sufficient for infrastructure tests and random-weight training
runs in environments without the vocab files.
"""

from __future__ import annotations

import hashlib
import warnings
from typing import List, Sequence

import numpy as np


class HashTokenizer:
    def __init__(
        self,
        vocab_size: int = 49408,
        max_length: int = 77,
        bos_id: int | None = None,
        eos_id: int | None = None,
        pad_id: int | None = None,
        quiet: bool = False,
    ):
        if not quiet:
            warnings.warn(
                "HashTokenizer is a SMOKE-TEST fallback: prompts are hashed to "
                "pseudo-random token ids, so text conditioning is garbage. "
                "Pass --tokenizer-dir (a local transformers tokenizer dir) for "
                "real training/validation/demo runs.",
                stacklevel=2,
            )
        self.vocab_size = vocab_size
        self.max_length = max_length
        self.bos_id = vocab_size - 2 if bos_id is None else bos_id
        self.eos_id = vocab_size - 1 if eos_id is None else eos_id
        self.pad_id = self.eos_id if pad_id is None else pad_id  # CLIP pads with eot

    def _tok(self, word: str) -> int:
        h = int.from_bytes(hashlib.md5(word.encode()).digest()[:4], "little")
        return h % (self.vocab_size - 3) + 1  # avoid 0/bos/eos

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        out = np.full((len(texts), self.max_length), self.pad_id, np.int32)
        for i, t in enumerate(texts):
            ids = [self.bos_id] + [self._tok(w) for w in t.lower().split()]
            ids = ids[: self.max_length - 1] + [self.eos_id]
            out[i, : len(ids)] = ids
        return out


class HFTokenizer:
    """transformers tokenizer from a local directory (no network)."""

    def __init__(self, path: str, max_length: int = 77):
        from transformers import AutoTokenizer

        self.tok = AutoTokenizer.from_pretrained(path, local_files_only=True)
        self.max_length = max_length

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        enc = self.tok(
            list(texts),
            padding="max_length",
            max_length=self.max_length,
            truncation=True,
            return_tensors="np",
        )
        return enc["input_ids"].astype(np.int32)
