"""Fixed-shape batched inference engine for few-step PCM students.

TPU serving economics dictate the design: XLA compiles ONE graph at a fixed
batch size, partial batches are padded (pad rows are free relative to a
recompile or a bucket of graphs), and every request carries its own seed so
results are reproducible regardless of which batch the request landed in
(per-request init noise via ``TextToImagePipeline.generate(init_latents=...)``).

The reference repo serves through a single-request gradio app
(`demo/app.py:61-101`); this is the production path it lacks.
"""

from __future__ import annotations

import dataclasses
import os
import threading
from typing import Any, Callable, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..sampling.pipeline import TextToImagePipeline, bundle_latent_channels


def make_prompt_encoder(
    bundle, toks: Dict[str, Any], resolution: int, frozen
) -> Callable:
    """Family-dispatched ``encode(prompts) -> cond`` over a bundle's text
    towers (same shapes scripts/train.py's validation encoder produces)."""
    family = type(bundle).__name__

    def encode(prompts: Sequence[str]):
        n = len(prompts)
        ids = {k: jnp.asarray(t(list(prompts))) for k, t in toks.items()}
        if family == "SD15Bundle":
            return bundle.encode_prompts(frozen, ids["input_ids"])
        if family == "SDXLBundle":
            time_ids = jnp.tile(
                jnp.asarray(
                    [[resolution, resolution, 0, 0, resolution, resolution]],
                    jnp.float32,
                ),
                (n, 1),
            )
            return bundle.encode_prompts(
                frozen, ids["input_ids"], ids["input_ids_2"], time_ids
            )
        return bundle.encode_prompts(
            frozen, ids["input_ids"], ids["input_ids_2"], ids["input_ids_3"]
        )

    return encode


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    batch_size: int = 4
    latent_hw: int = 64  # resolution // vae_scale
    resolution: int = 512
    guidance_scale: float = 1.0
    decode_chunk: Optional[int] = None


class InferenceEngine:
    """Thread-safe batched generate over one compiled pipeline graph.

    ``generate_batch`` takes up to ``batch_size`` (prompt, seed) pairs, pads
    the tail by repeating the last row, and returns exactly ``len(prompts)``
    uint8 HWC images. One jitted graph per engine; no shape buckets.
    """

    def __init__(
        self,
        bundle,
        sampler,
        frozen,
        lora,
        toks: Dict[str, Any],
        cfg: EngineConfig,
        mesh=None,
    ):
        """``mesh``: optional `jax.sharding.Mesh` with a ``data`` axis —
        the batch is sharded across it (data-parallel multi-chip serving;
        ``batch_size`` must be a multiple of the axis size), params are
        replicated."""
        self.bundle = bundle
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import replicate

            frozen = replicate(frozen, mesh)
            lora = replicate(lora, mesh) if lora is not None else None
        self.frozen = frozen
        self.lora = lora
        self.lora_source: Optional[str] = None
        self.adapters: Dict[str, Any] = {}  # named adapters (per-request routing)
        self.pipe = TextToImagePipeline(bundle, sampler)
        self._encode = make_prompt_encoder(bundle, toks, cfg.resolution, frozen)
        self._lock = threading.Lock()  # one device executor
        self.stats = {"requests": 0, "batches": 0, "pad_rows": 0, "lora_swaps": 0}

        use_cfg = cfg.guidance_scale > 1.0
        self._uncond = (
            self._encode([""] * cfg.batch_size) if use_cfg else None
        )
        if mesh is not None and self._uncond is not None:
            from ..parallel.mesh import shard_batch

            self._uncond = shard_batch(self._uncond, mesh)
        ch = bundle_latent_channels(bundle)
        self._latent_shape = (cfg.latent_hw, cfg.latent_hw, ch)

        def _gen(frozen_, lora_, cond, rng, init):
            return self.pipe.generate(
                frozen_, lora_, cond, self._uncond, rng,
                latent_hw=cfg.latent_hw, guidance_scale=cfg.guidance_scale,
                decode_chunk=cfg.decode_chunk, init_latents=init,
            )

        self._gen = jax.jit(_gen)

    def _load_tree(self, source: Union[str, os.PathLike, Any]):
        """Kohya path / tree -> device-ready lora tree shaped like the compiled
        graph's adapter argument; rejects anything that would force a
        recompile (structure or leaf-shape change)."""
        if self.lora is None:
            raise ValueError(
                "engine was built without a LoRA tree; construct it with the "
                "bundle's zero-init lora template to enable hot-swap"
            )
        if isinstance(source, (str, os.PathLike)):
            from ..lora.kohya import load_kohya_safetensors

            spec = self.bundle.lora
            new, file_alpha = load_kohya_safetensors(
                str(source), self.lora, spec.rank
            )
            # LoRASpec.scale is baked into the compiled graph; a file whose
            # alpha differs would be applied at the wrong strength with no
            # recompile to honor it — warn loudly rather than silently misscale
            eff_alpha = spec.alpha if spec.alpha is not None else spec.rank
            if abs(file_alpha - eff_alpha) > 1e-6:
                import warnings

                warnings.warn(
                    f"kohya file alpha={file_alpha} != compiled graph alpha="
                    f"{eff_alpha} (LoRASpec.scale is baked into the jitted "
                    f"graph); adapter will run at {eff_alpha / max(file_alpha, 1e-9):.3g}x "
                    "its intended strength. Rescale the file or rebuild the "
                    "engine with a matching LoRASpec.alpha.",
                    stacklevel=3,
                )
            name = str(source)
        else:
            new, name = source, "<tree>"
        old_s = jax.tree_util.tree_structure(self.lora)
        new_s = jax.tree_util.tree_structure(new)
        if old_s != new_s:
            raise ValueError(f"lora tree structure mismatch: {new_s} != {old_s}")
        mismatched = [
            (a.shape, a.dtype, b.shape, b.dtype)
            for a, b in zip(jax.tree.leaves(new), jax.tree.leaves(self.lora))
            if a.shape != b.shape or a.dtype != b.dtype
        ]
        if mismatched:
            raise ValueError(
                f"lora leaf shape/dtype mismatch (would recompile): {mismatched[:3]}")
        if self.mesh is not None:
            from ..parallel.mesh import replicate

            new = replicate(new, self.mesh)
        return new, name

    def load_lora(self, source: Union[str, os.PathLike, Any]) -> None:
        """Hot-swap the default LoRA adapter without recompiling.

        The compiled graph takes the adapter tree as an ARGUMENT, so a swap is
        a host→device transfer — serving traffic resumes on the next batch with
        the new weights. ``source`` is a kohya-format ``.safetensors`` path or
        an already-shaped lora tree. The engine must have been constructed with
        an adapter tree (a zero-init template acts as a no-op adapter, LoRA
        ``b=0``): going from ``lora=None`` to a tree changes the pytree
        structure and would force a full recompile, so that is rejected.
        """
        new, name = self._load_tree(source)
        with self._lock:  # never swap mid-batch
            self.lora = new
            self.lora_source = name
            self.stats["lora_swaps"] += 1

    def register_adapter(self, name: str, source: Union[str, os.PathLike, Any]) -> None:
        """Register a named adapter for per-request selection (multi-tenant
        serving: one compiled graph, many adapters — requests pick one and the
        dispatcher batches per adapter). Same no-recompile checks as
        ``load_lora``."""
        new, _ = self._load_tree(source)
        with self._lock:
            self.adapters[name] = new

    def unregister_adapter(self, name: str) -> None:
        """Drop a named adapter, releasing its device buffers (each registered
        adapter pins a full f32 LoRA tree in HBM until unregistered)."""
        with self._lock:
            if name not in self.adapters:
                raise KeyError(
                    f"unknown adapter {name!r}; registered: {self.adapter_names}")
            del self.adapters[name]

    @property
    def adapter_names(self) -> List[str]:
        return sorted(self.adapters)

    def _init_noise(self, seeds: Sequence[int]) -> jnp.ndarray:
        keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
        return jax.vmap(
            lambda k: jax.random.normal(k, self._latent_shape, jnp.float32)
        )(keys)

    def generate_batch(
        self,
        prompts: Sequence[str],
        seeds: Sequence[int],
        adapter: Optional[str] = None,
    ) -> np.ndarray:
        """``adapter``: a name registered via ``register_adapter`` — the whole
        device batch runs with that adapter (the dispatcher groups requests by
        adapter); None = the engine's default ``lora``."""
        assert len(prompts) == len(seeds) != 0
        n, b = len(prompts), self.cfg.batch_size
        assert n <= b, f"batch of {n} exceeds engine batch_size {b}"
        pad = b - n
        prompts = list(prompts) + [prompts[-1]] * pad
        seeds = list(seeds) + [seeds[-1]] * pad
        with self._lock:
            if adapter is not None and adapter not in self.adapters:
                raise KeyError(
                    f"unknown adapter {adapter!r}; registered: {self.adapter_names}")
            lora = self.adapters[adapter] if adapter is not None else self.lora
            cond = self._encode(prompts)
            init = self._init_noise(seeds)
            if self.mesh is not None:
                from ..parallel.mesh import shard_batch

                cond = shard_batch(cond, self.mesh)
                init = shard_batch(init, self.mesh)
            # the in-loop rng only matters for stochastic samplers' renoise;
            # fold the batch seeds so those runs are still deterministic per
            # (batch composition, seeds)
            rng = jax.random.PRNGKey(int(seeds[0]) & 0x7FFFFFFF)
            imgs = self._gen(self.frozen, lora, cond, rng, init)
            out = np.asarray(imgs[:n], np.float32)
            self.stats["requests"] += n
            self.stats["batches"] += 1
            self.stats["pad_rows"] += pad
        return np.clip((out + 1) * 127.5, 0, 255).astype(np.uint8)

    def warmup(self) -> None:
        """Compile the graph before serving traffic."""
        self.generate_batch(["warmup"], [0])
