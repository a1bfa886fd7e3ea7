"""Tokenizers for the text towers.

`HFTokenizer` wraps a local transformers tokenizer directory (CLIP BPE or T5
sentencepiece) when vocab files are available. `HashTokenizer` is the
offline fallback: deterministic token hashing with CLIP-style BOS/EOS
framing — sufficient for infrastructure tests and random-weight training
runs in environments without the vocab files.
"""

from __future__ import annotations

import hashlib
import os
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


# per-tower subdirectory names used by HF pipeline dumps (SDXL/SD3 ship
# `tokenizer/`, `tokenizer_2/`, `tokenizer_3/` side by side)
TOWER_SUBDIRS = {
    "input_ids": "tokenizer",
    "input_ids_2": "tokenizer_2",
    "input_ids_3": "tokenizer_3",
}


def resolve_tokenizers(
    tokenizer_dir: "str | None",
    tok_keys: Sequence[str],
    allow_hash: bool = False,
    max_length: int = 77,
):
    """Build the per-tower tokenizer dict for the CLIs.

    ``tokenizer_dir`` may be a single tokenizer dir or a pipeline root with
    ``tokenizer{,_2,_3}/`` subdirs. CLIP towers prefer the native C++ BPE
    (``native/clip_bpe.cpp``) whenever ``vocab.json`` + ``merges.txt`` exist
    — it is GIL-free and transformers-parity-tested; the T5 tower
    (``input_ids_3``) is sentencepiece, so it always goes through
    transformers. Without a tokenizer dir, the pseudo-random HashTokenizer
    requires ``allow_hash=True``: it is a smoke-test device, and a long run
    on it burns accelerator-hours training garbage conditioning
    (round-3 VERDICT #8). Hash ids are bounded per tower (T5 vocab is 32128,
    not CLIP's 49408 — ids past the embedding table gather out of bounds)."""
    if tokenizer_dir:
        toks = {}
        for k in tok_keys:
            d = tokenizer_dir
            sub = os.path.join(tokenizer_dir, TOWER_SUBDIRS.get(k, ""))
            if TOWER_SUBDIRS.get(k) and os.path.isdir(sub):
                d = sub
            vocab = os.path.join(d, "vocab.json")
            merges = os.path.join(d, "merges.txt")
            if k != "input_ids_3" and os.path.exists(vocab) and os.path.exists(merges):
                try:
                    from .native_tokenizer import NativeCLIPTokenizer

                    toks[k] = NativeCLIPTokenizer(vocab, merges, max_length=max_length)
                    continue
                except Exception as e:  # no toolchain / bad vocab: HF fallback
                    warnings.warn(f"native CLIP BPE unavailable ({e}); "
                                  f"falling back to transformers for {k}")
            toks[k] = HFTokenizer(d, max_length)
        return toks
    if not allow_hash:
        raise FileNotFoundError(
            "no tokenizer: pass --tokenizer-dir (a transformers tokenizer dir "
            "or one holding vocab.json+merges.txt for the native CLIP BPE), "
            "or opt in to --allow-hash-tokenizer for smoke runs (prompts are "
            "hashed to pseudo-random ids; text conditioning is garbage)"
        )
    return {
        k: HashTokenizer(vocab_size=32128 if k == "input_ids_3" else 49408,
                         max_length=max_length)
        for k in tok_keys
    }
