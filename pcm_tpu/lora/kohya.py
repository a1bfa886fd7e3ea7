"""Kohya / diffusers-peft LoRA interop.

Export our ``lora`` collection to kohya-format safetensors
(``lora_unet_<path>.lora_down.weight`` / ``.lora_up.weight`` / ``.alpha``),
the format the reference releases its checkpoints in
(`get_module_kohya_state_dict`, `train_pcm_lora_sd15.py:52-72`), and import
released kohya/peft LoRA weights back into our tree (for evaluating official
PCM checkpoints). Also covers the release post-processing convention: weights
halved + fp16 (`convert.py:9-21`) and the inverse sqrt(alpha) load rescale
(`sd3_test.py:16-18`).

Shape conventions:
  ours:   dense a (in, r), b (r, out); conv a (kh, kw, in, r), b (1, 1, r, out)
  kohya:  lora_down (r, in) / (r, in, kh, kw); lora_up (out, r) / (out, r, 1, 1)
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix=()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def _expand_scanned(flat: Dict[Tuple[str, ...], Any]) -> Dict[Tuple[str, ...], Any]:
    """Scan-stacked leaves (`.../blocks_scan/block/...` with a leading depth
    axis, models/attention.py scan_blocks) -> the unrolled
    `.../transformer_blocks_{d}/...` layout, so exports are identical
    regardless of which graph layout trained them."""
    out: Dict[Tuple[str, ...], Any] = {}
    for path, v in flat.items():
        if "blocks_scan" in path:
            i = path.index("blocks_scan")
            arr = np.asarray(v)
            for d in range(arr.shape[0]):
                out[path[:i] + (f"transformer_blocks_{d}",) + path[i + 2:]] = arr[d]
        else:
            out[path] = v
    return out


def to_kohya_state_dict(
    lora_tree: Dict[str, Any], alpha: float, prefix: str = "lora_unet"
) -> Dict[str, np.ndarray]:
    """Our lora collection -> kohya-format numpy state dict. Scan-stacked
    trees export identically to unrolled ones (`_expand_scanned`)."""
    flat = _expand_scanned(_flatten(lora_tree))
    out: Dict[str, np.ndarray] = {}
    pairs: Dict[Tuple[str, ...], Dict[str, np.ndarray]] = {}
    for path, v in flat.items():
        layer, leaf = path[:-1], path[-1]
        pairs.setdefault(layer, {})[leaf] = np.asarray(v)
    for layer, ab in sorted(pairs.items()):
        a, b = ab["a"], ab["b"]
        key = prefix + "_" + "_".join(layer)
        if a.ndim == 2:  # dense: (in, r) -> (r, in); (r, out) -> (out, r)
            down, up = a.T, b.T
        else:  # conv: (kh,kw,in,r) -> (r,in,kh,kw); (1,1,r,out) -> (out,r,1,1)
            down = np.transpose(a, (3, 2, 0, 1))
            up = np.transpose(b, (3, 2, 0, 1))
        out[f"{key}.lora_down.weight"] = down
        out[f"{key}.lora_up.weight"] = up
        out[f"{key}.alpha"] = np.asarray(alpha, down.dtype)
    return out


def from_kohya_state_dict(
    state: Dict[str, Any], template: Dict[str, Any], rank: int, prefix: str = "lora_unet"
) -> Tuple[Dict[str, Any], float]:
    """Kohya-format state dict -> our lora tree (shaped like ``template``).

    Returns (tree, alpha). Raises KeyError for layers present in the template
    but missing from the file.
    """
    flat_t = _flatten(template)
    layers = sorted({p[:-1] for p in flat_t})
    out: Dict[Tuple[str, ...], jnp.ndarray] = {}
    alpha = float(rank)

    def read(key):
        nonlocal alpha
        down = np.asarray(state[f"{key}.lora_down.weight"], np.float32)
        up = np.asarray(state[f"{key}.lora_up.weight"], np.float32)
        if f"{key}.alpha" in state:
            alpha = float(np.asarray(state[f"{key}.alpha"]))
        if down.ndim == 2:
            return down.T, up.T
        return (np.transpose(down, (2, 3, 1, 0)),
                np.transpose(up, (2, 3, 1, 0)))

    for layer in layers:
        if "blocks_scan" in layer:
            # scan-stacked template: gather the unrolled per-block entries
            # (the on-disk format is always the unrolled kohya naming)
            i = layer.index("blocks_scan")
            depth = int(flat_t[layer + ("a",)].shape[0])
            stacked_a, stacked_b = [], []
            for d in range(depth):
                unrolled = layer[:i] + (f"transformer_blocks_{d}",) + layer[i + 2:]
                a, b = read(prefix + "_" + "_".join(unrolled))
                stacked_a.append(a)
                stacked_b.append(b)
            out[layer + ("a",)] = jnp.asarray(np.stack(stacked_a))
            out[layer + ("b",)] = jnp.asarray(np.stack(stacked_b))
            continue
        a, b = read(prefix + "_" + "_".join(layer))
        out[layer + ("a",)] = jnp.asarray(a)
        out[layer + ("b",)] = jnp.asarray(b)
    return _unflatten(out), alpha


def save_kohya_safetensors(path: str, lora_tree, alpha: float, dtype=np.float16, prefix="lora_unet"):
    from safetensors.numpy import save_file

    sd = to_kohya_state_dict(lora_tree, alpha, prefix)
    save_file({k: v.astype(dtype) for k, v in sd.items()}, path)


def load_kohya_safetensors(path: str, template, rank: int, prefix="lora_unet"):
    from safetensors.numpy import load_file

    return from_kohya_state_dict(load_file(path), template, rank, prefix)


def halve_fp16(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Release post-processing: weight/2 then fp16 (`convert.py:14-15`)."""
    return {k: (np.asarray(v) / 2).astype(np.float16) for k, v in state.items()}


def rescale_sqrt_alpha(state: Dict[str, np.ndarray], alpha: float = 1.0):
    """Load-time rescale convention (`sd3_test.py:16-18`)."""
    return {k: np.asarray(v) * np.sqrt(alpha) for k, v in state.items()}
