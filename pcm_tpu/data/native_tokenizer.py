"""ctypes binding for the native C++ CLIP BPE tokenizer (native/clip_bpe.cpp).

Builds on first use if the shared library is missing (g++ is part of the
image). Falls back with ImportError if no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB = os.path.join(_NATIVE_DIR, "libclip_bpe.so")


def _ensure_built() -> str:
    if not os.path.exists(_LIB):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    return _LIB


class NativeCLIPTokenizer:
    """CLIP BPE from vocab.json + merges.txt, implemented in C++.

    ids framing matches CLIPTokenizer: BOS(49406) text EOS(49407), padded
    with EOS (CLIP pads with the end-of-text token).
    """

    def __init__(
        self,
        vocab_path: str,
        merges_path: str,
        max_length: int = 77,
        bos_id: int = 49406,
        eos_id: int = 49407,
        pad_id: int | None = None,
    ):
        lib = ctypes.CDLL(_ensure_built())
        lib.clip_bpe_new.restype = ctypes.c_void_p
        lib.clip_bpe_new.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.clip_bpe_encode_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
        ]
        lib.clip_bpe_free.argtypes = [ctypes.c_void_p]
        self._lib = lib
        pad_id = eos_id if pad_id is None else pad_id
        self._handle = lib.clip_bpe_new(
            vocab_path.encode(), merges_path.encode(), bos_id, eos_id, pad_id
        )
        if not self._handle:
            raise RuntimeError(f"failed to load vocab/merges: {vocab_path}, {merges_path}")
        self.max_length = max_length

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        n = len(texts)
        out = np.empty((n, self.max_length), np.int32)
        arr = (ctypes.c_char_p * n)(*[t.encode("utf-8", "ignore") for t in texts])
        self._lib.clip_bpe_encode_batch(
            self._handle,
            arr,
            n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.max_length,
        )
        return out

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.clip_bpe_free(self._handle)
