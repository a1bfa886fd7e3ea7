"""On-device random initialization of benchmark weight trees.

Round-2 post-mortem: ``bench.py``'s *warm* start still cost 424 s — the
treecache memmap load is ~8 s, but pushing ~4 GiB of leaves through the axon
tunnel runs at only ~20-35 MB/s (measured; threads don't help, the tunnel is
one stream). Benchmark weights are synthetic (this image has no released
checkpoints; real training restores ported checkpoints anyway), so nothing
needs to cross the wire at all: generate the same fan-in-scaled random tree
directly on the TPU as ONE jitted, persistently-cacheable XLA program.
Int8 weight-only quantization (``utils.quant``) runs on-device in the same
program, so the int8 tree never exists on the host either.

Fill rules mirror ``train.bundles.init_frozen_fast`` (norm scales -> ones,
biases/LoRA-B -> zeros, everything else fan-in-scaled normals); values differ
leaf-by-leaf (independent fold_in streams instead of one sequential host rng)
which only changes the synthetic benchmark loss, not the compiled work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _plan(path, sds, cast_dtype):
    """(kind, dtype, std) for one leaf — the init_frozen_fast fill rules."""
    name = jax.tree_util.keystr(path).lower()
    shape, dtype = sds.shape, sds.dtype
    if cast_dtype is not None and dtype == jnp.float32:
        dtype = cast_dtype
    if not shape:
        return ("zeros", dtype, 0.0)
    if "'scale'" in name or "'weight'" in name and len(shape) == 1:
        return ("ones", dtype, 0.0)
    if "'bias'" in name or name.endswith("['b']"):
        return ("zeros", dtype, 0.0)
    fan_in = 1
    for d in shape[:-1]:
        fan_in *= d
    if len(shape) == 1:
        fan_in = shape[0]
    std = 1.0 / max(fan_in, 1) ** 0.5
    return ("normal", dtype, std)


def build_device_init(bundle, weights: str = "bf16", cast_dtype=jnp.bfloat16):
    """Return ``gen(key) -> (frozen, lora)`` suitable for ``jax.jit``.

    ``weights="int8"`` applies ``quant.quantize_frozen`` inside the same
    traced program (VAE kept bf16, matching the host path).
    """
    from ..ops.common import reference_ops

    with reference_ops():
        shapes = jax.eval_shape(lambda r: bundle.init(r), jax.random.PRNGKey(0))
    frozen_s, lora_s = shapes

    def _gen_tree(shapes_tree, key, lora: bool):
        leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(shapes_tree)
        out = []
        for i, (path, sds) in enumerate(leaves_with_path):
            kind, dtype, std = _plan(path, sds, cast_dtype)
            if lora:
                # LoRA masters stay fp32; B factors are zeros already via the
                # bias rule (keystr endswith ['b'])
                dtype = jnp.float32
            if kind == "zeros":
                out.append(jnp.zeros(sds.shape, dtype))
            elif kind == "ones":
                out.append(jnp.ones(sds.shape, dtype))
            else:
                k = jax.random.fold_in(key, i)
                # generate in f32 and cast once; XLA fuses normal->mul->cast
                # per leaf so the f32 intermediate never materializes
                arr = jax.random.normal(k, sds.shape, jnp.float32) * std
                out.append(arr.astype(dtype))
        return jax.tree_util.tree_unflatten(treedef, out)

    def gen(key):
        kf, kl = jax.random.split(key)
        frozen = _gen_tree(frozen_s, kf, lora=False)
        if weights == "int8":
            from .quant import quantize_frozen

            frozen = quantize_frozen(frozen)
        lora = _gen_tree(lora_s, kl, lora=True)
        return frozen, lora

    return gen


def device_init(bundle, seed: int = 0, weights: str = "bf16", device=None):
    """Generate (frozen, lora) directly on ``device`` (default: first device).

    The program is jit-compiled once and lands in the persistent compile
    cache, so warm starts cost one small cache hit + on-device generation —
    no multi-GiB host->device transfer.
    """
    import sys
    import time

    t0 = time.time()
    gen = build_device_init(bundle, weights)
    dev = device or jax.devices()[0]
    with jax.default_device(dev):
        lowered = jax.jit(gen).lower(jax.random.PRNGKey(seed))
        t1 = time.time()
        compiled = lowered.compile()
        t2 = time.time()
        frozen, lora = compiled(jax.random.PRNGKey(seed))
        t3 = time.time()
    # phase timings to attribute the init cost (round-2: 147 s total on the
    # axon backend with a warm compile cache — which phase pays is unknown
    # until measured on-chip; "call" includes creating ~5k output buffers
    # through the remote tunnel)
    print(
        f"# device_init phases: trace+lower {t1-t0:.1f}s "
        f"compile {t2-t1:.1f}s call {t3-t2:.1f}s",
        file=sys.stderr,
    )
    return frozen, lora
