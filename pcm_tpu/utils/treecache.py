"""Disk cache for built parameter pytrees.

Round-1 post-mortem: `bench.py` spent 1607 s on host-side init (numpy
structure fill + int8 quantization + device_put) before compile even started,
which timed out the driver's benchmark run. The reference has no such cost —
it mmap-loads safetensors checkpoints (diffusers `from_pretrained`). This is
the TPU-repo equivalent: the first build of a (bundle, seed, quantization)
combination is saved as one flat directory of ``.npy`` leaves plus a pickled
treedef; subsequent runs memmap-load in seconds and stream straight into
``jax.device_put``.

Works for any pytree whose leaves are numpy/JAX arrays — including the
``QTensor`` int8 leaves from :mod:`pcm_tpu.utils.quant` (flax struct
dataclasses pickle fine inside the treedef).
"""

from __future__ import annotations

import os
import pickle
import tempfile

import jax
import numpy as np

try:  # bf16 numpy arrays round-trip through a uint16 view
    import ml_dtypes

    _BF16 = np.dtype(ml_dtypes.bfloat16)
except Exception:  # pragma: no cover
    _BF16 = None

_FORMAT_VERSION = 1


def save_tree(dir_path: str, tree) -> None:
    """Write ``tree`` to ``dir_path`` (atomically via a temp dir + rename)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    parent = os.path.dirname(os.path.abspath(dir_path)) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=parent, prefix=".treecache_tmp_")
    try:
        dtypes = []
        for i, leaf in enumerate(leaves):
            arr = np.asarray(leaf)
            dtypes.append(str(arr.dtype))
            if _BF16 is not None and arr.dtype == _BF16:
                arr = arr.view(np.uint16)
            np.save(os.path.join(tmp, f"leaf_{i:05d}.npy"), arr)
        with open(os.path.join(tmp, "meta.pkl"), "wb") as f:
            pickle.dump(
                {"version": _FORMAT_VERSION, "treedef": treedef,
                 "n": len(leaves), "dtypes": dtypes},
                f,
            )
        if os.path.isdir(dir_path):
            import shutil

            shutil.rmtree(dir_path)
        os.rename(tmp, dir_path)
    except BaseException:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        raise


def load_tree(dir_path: str, mmap: bool = True):
    """Load a tree saved by :func:`save_tree`. Leaves come back as numpy
    (memmapped by default) — pass them to ``jax.device_put`` / jitted fns
    directly; nothing is copied until then."""
    with open(os.path.join(dir_path, "meta.pkl"), "rb") as f:
        meta = pickle.load(f)
    if meta.get("version") != _FORMAT_VERSION:
        raise ValueError(f"treecache format {meta.get('version')} != {_FORMAT_VERSION}")
    mode = "r" if mmap else None
    leaves = []
    for i, dt in enumerate(meta["dtypes"]):
        arr = np.load(os.path.join(dir_path, f"leaf_{i:05d}.npy"), mmap_mode=mode)
        if dt == "bfloat16":
            if _BF16 is None:
                raise RuntimeError("ml_dtypes unavailable; cannot restore bf16 leaves")
            arr = arr.view(_BF16)
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(meta["treedef"], leaves)


def load_or_build(dir_path: str, build_fn, verbose: bool = True):
    """Return the cached tree at ``dir_path``; on any miss/corruption, call
    ``build_fn()`` and persist its result for next time."""
    import sys
    import time

    if os.path.isdir(dir_path):
        try:
            t0 = time.time()
            tree = load_tree(dir_path)
            if verbose:
                print(f"# treecache hit {dir_path} ({time.time()-t0:.1f}s)",
                      file=sys.stderr)
            return tree
        except Exception as e:  # corrupt/stale — rebuild
            if verbose:
                print(f"# treecache load failed ({type(e).__name__}: {e}); rebuilding",
                      file=sys.stderr)
    t0 = time.time()
    tree = build_fn()
    try:
        save_tree(dir_path, tree)
        if verbose:
            print(f"# treecache built+saved {dir_path} ({time.time()-t0:.1f}s)",
                  file=sys.stderr)
    except Exception as e:  # disk full etc. — still return the tree
        if verbose:
            print(f"# treecache save failed ({type(e).__name__}: {e})", file=sys.stderr)
    return tree
