"""Model bundles: per-family glue between raw modules and the distill step.

A bundle owns the flax module instances (student with LoRA spec, the same
architecture without LoRA for teacher/frozen passes, VAE, text encoders) and
exposes a uniform functional surface:

    encode(frozen, batch, rng)        -> (latents, cond, uncond_cond)
    student(frozen, lora, x, t, cond) -> model prediction
    teacher(frozen, x, t, cond)       -> model prediction (no LoRA)
    teacher_features(frozen, x, t, cond) -> per-block features (discriminator)

``frozen`` is the dict of frozen parameter trees (base model, vae, text
towers), kept outside TrainState so it is never touched by the optimizer.

Text/vae encoding runs inside the jitted train step exactly like the
reference's hot loop (`train_pcm_lora_sd15.py:1121-1135`) — one XLA program
per step, no eager islands.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..lora.layers import LoRASpec, NO_LORA
from ..models.clip import CLIPTextConfig, CLIPTextModel
from ..models.mmdit import MMDiT, MMDiTConfig
from ..models.t5 import T5Config, T5Encoder
from ..models.unet import UNet2DCondition, UNetConfig
from ..models.vae import AutoencoderKL, VAEConfig

# LoRA target list mirroring the reference SD1.5/SDXL peft config
# (`train_pcm_lora_sd15.py:866-885`).
SD_UNET_LORA_TARGETS = (
    "to_q", "to_k", "to_v", "to_out_0", "proj_in", "proj_out",
    "net_0_proj", "net_2", "conv1", "conv2", "conv_shortcut",
    "downsamplers_0/conv", "upsamplers_0/conv", "time_emb_proj",
)


Cond = Dict[str, Any]


def _decode_chunked(vae, params, latents, chunk: Optional[int]) -> jnp.ndarray:
    """VAE decode, optionally `lax.map`-ed over batch chunks.

    At 1024px the decoder's activations are ~0.5G/sample; decoding a whole
    generation batch at once OOMs above bs4 on a 16G chip. Chunking bounds
    peak decoder memory at `chunk` samples (the batch must divide evenly).
    """
    b = latents.shape[0]
    if not chunk or b <= chunk:
        return vae.apply({"params": params}, latents, method=AutoencoderKL.decode)
    if b % chunk:
        raise ValueError(f"batch {b} not divisible by decode chunk {chunk}")
    xs = latents.reshape(b // chunk, chunk, *latents.shape[1:])
    ys = jax.lax.map(
        lambda z: vae.apply({"params": params}, z, method=AutoencoderKL.decode), xs
    )
    return ys.reshape(b, *ys.shape[2:])


def _encode_chunked(vae, params, pixels, rng, chunk: Optional[int],
                    shards: int = 1) -> jnp.ndarray:
    """VAE encode, optionally `lax.map`-ed over batch chunks (the reference
    encodes in <=32-sample chunks for the same reason, sd15 train:1127-1135).

    At 1024px the encoder's first conv materializes ~256M/sample temps
    (bs4 full-step OOM'd on three 1.0G encoder buffers); chunking bounds peak
    encoder memory at `chunk` samples for a negligible serialization cost —
    encode is a tiny slice of the step.

    ``chunk`` is PER DATA SHARD: with ``shards`` > 1 (a data-parallel mesh)
    the batch is interleaved so every map iteration encodes ``chunk`` samples
    on EVERY shard — a contiguous global chunk would run on one device while
    the rest idle (round-3 ADVICE). The (shards, per) reshape aligns with the
    batch sharding boundary, so the moveaxis is a GSPMD relabel, not a
    collective. Ragged batches fall back to a head map + unchunked tail,
    mirroring the reference's ragged last slice (sd15 train:1128-1133)."""
    b = pixels.shape[0]
    enc = lambda px, key: vae.apply({"params": params}, px, key,
                                    method=AutoencoderKL.encode)
    if not chunk or b <= chunk * shards:
        return enc(pixels, rng)
    if shards > 1:
        per = b // shards
        if b % shards or per % chunk:
            return _encode_chunked(vae, params, pixels, rng, chunk * shards)
        rest = pixels.shape[1:]
        n = per // chunk
        # (shards, n, chunk, ...): dim 0 aligns with the batch-sharding
        # boundary; every reshape below merges with the SHARDED dim major, so
        # GSPMD relabels instead of inserting an all-to-all.
        xs = jnp.moveaxis(pixels.reshape(shards, n, chunk, *rest), 0, 1)
        keys = jax.random.split(rng, n)
        ys = jax.lax.map(
            lambda t: enc(t[0].reshape(shards * chunk, *rest), t[1]), (xs, keys)
        )  # (n, shards*chunk, lat...)
        lat_rest = ys.shape[2:]
        lat = jnp.moveaxis(ys.reshape(n, shards, chunk, *lat_rest), 1, 0)
        return lat.reshape(b, *lat_rest)
    n, tail = divmod(b, chunk)
    head = pixels[: n * chunk].reshape(n, chunk, *pixels.shape[1:])
    keys = jax.random.split(rng, n + 1)
    ys = jax.lax.map(lambda t: enc(t[0], t[1]), (head, keys[:n]))
    out = ys.reshape(n * chunk, *ys.shape[2:])
    if tail:
        out = jnp.concatenate([out, enc(pixels[n * chunk :], keys[n])], axis=0)
    return out


@dataclasses.dataclass(frozen=True)
class SD15Bundle:
    """SD1.5: single CLIP-L, last hidden state conditioning."""

    unet_cfg: UNetConfig
    vae_cfg: VAEConfig
    text_cfg: CLIPTextConfig
    lora: LoRASpec
    dtype: Any = jnp.bfloat16
    remat: bool = False
    remat_policy: Optional[str] = None  # e.g. "dots" (ops/common.py:resolve_remat_policy)
    remat_levels: Optional[Tuple[bool, ...]] = None  # per-level mask (models/unet.py)
    vae_encode_chunk: Optional[int] = None  # bound encoder peak (see _encode_chunked)
    vae_encode_shards: int = 1  # data-mesh axis size: chunk is PER SHARD
    remat_granularity: str = "module"  # "block" = per-transformer-block (models/unet.py)
    scan_blocks: bool = False  # lax.scan the transformer stacks (models/unet.py)

    def __post_init__(self):
        object.__setattr__(
            self, "_student",
            UNet2DCondition(self.unet_cfg, self.dtype, self.lora, self.remat,
                            self.remat_policy, self.remat_levels,
                            remat_granularity=self.remat_granularity,
                            scan_blocks=self.scan_blocks),
        )
        object.__setattr__(
            self, "_teacher",
            UNet2DCondition(self.unet_cfg, self.dtype, NO_LORA, self.remat,
                            self.remat_policy, self.remat_levels,
                            remat_granularity=self.remat_granularity,
                            scan_blocks=self.scan_blocks),
        )
        object.__setattr__(self, "_vae", AutoencoderKL(self.vae_cfg, self.dtype))
        object.__setattr__(self, "_text", CLIPTextModel(self.text_cfg, self.dtype))

    # -- init -------------------------------------------------------------
    def init(self, rng, image_size: int = None, seq_len: int = 77):
        del image_size  # params are independent of spatial size
        r1, r2, r3 = jax.random.split(rng, 3)
        image_size = 64
        latent = 16
        x = jnp.zeros((1, latent, latent, self.unet_cfg.in_channels), self.dtype)
        t = jnp.zeros((1,))
        ctx = jnp.zeros((1, seq_len, self.unet_cfg.cross_attention_dim), self.dtype)
        uvars = jax.jit(self._student.init)(r1, x, t, ctx)
        vvars = jax.jit(self._vae.init)(r2, jnp.zeros((1, image_size, image_size, 3), self.dtype))
        tvars = jax.jit(self._text.init)(r3, jnp.zeros((1, seq_len), jnp.int32))
        frozen = {
            "unet": uvars["params"],
            "vae": vvars["params"],
            "text": tvars["params"],
        }
        return frozen, uvars["lora"]

    # -- encoding ---------------------------------------------------------
    def encode_prompts(self, frozen, input_ids) -> Cond:
        _, last, _ = self._text.apply({"params": frozen["text"]}, input_ids)
        return {"prompt_embeds": last, "added_cond": None}

    def decode_latents(self, frozen, latents, chunk: Optional[int] = None) -> jnp.ndarray:
        return _decode_chunked(self._vae, frozen["vae"], latents, chunk)

    def encode(self, frozen, batch, rng) -> Tuple[jnp.ndarray, Cond, Cond]:
        # cached-latents mode: the loader may supply precomputed VAE latents
        # and/or text embeddings (key presence is static under jit, so each
        # combination compiles its own step with the encoders sliced out).
        # The reference always re-encodes per step (sd15 train:1121-1135);
        # caching is a framework extra for fixed datasets.
        if "prompt_embeds" in batch:
            prompt_embeds = batch["prompt_embeds"]
        else:
            _, last, _ = self._text.apply({"params": frozen["text"]}, batch["input_ids"])
            prompt_embeds = jax.lax.stop_gradient(last)
        if "latents" in batch:
            latents = batch["latents"]
        else:
            latents = _encode_chunked(
                self._vae, frozen["vae"], batch["pixel_values"], rng,
                self.vae_encode_chunk, self.vae_encode_shards,
            )
            latents = jax.lax.stop_gradient(latents)
        cond = {"prompt_embeds": prompt_embeds, "added_cond": None}
        uncond = {"prompt_embeds": batch["uncond_embeds"], "added_cond": None}
        return latents, cond, uncond

    # -- forwards ---------------------------------------------------------
    def student(self, frozen, lora, x, t, cond):
        return self._student.apply(
            {"params": frozen["unet"], "lora": lora}, x, t, cond["prompt_embeds"],
            cond["added_cond"],
        )

    def teacher(self, frozen, x, t, cond):
        return self._teacher.apply(
            {"params": frozen["unet"]}, x, t, cond["prompt_embeds"], cond["added_cond"]
        )

    def teacher_features(self, frozen, x, t, cond, stop_after_mid: bool = False):
        _, feats = self._teacher.apply(
            {"params": frozen["unet"]}, x, t, cond["prompt_embeds"], cond["added_cond"],
            stop_after_mid=stop_after_mid, mutable=["features"],
        )
        return {k: v[0] for k, v in feats["features"].items()}


@dataclasses.dataclass(frozen=True)
class SDXLBundle:
    """SDXL: dual CLIP (penultimate hidden concat) + pooled te2 + time_ids."""

    unet_cfg: UNetConfig
    vae_cfg: VAEConfig
    text_cfg: CLIPTextConfig  # te1 (CLIP-L)
    text2_cfg: CLIPTextConfig  # te2 (bigG, with projection)
    lora: LoRASpec
    dtype: Any = jnp.bfloat16
    remat: bool = False
    remat_policy: Optional[str] = None  # e.g. "dots" (ops/common.py:resolve_remat_policy)
    remat_levels: Optional[Tuple[bool, ...]] = None  # per-level mask (models/unet.py)
    vae_encode_chunk: Optional[int] = None  # bound encoder peak (see _encode_chunked)
    vae_encode_shards: int = 1  # data-mesh axis size: chunk is PER SHARD
    remat_granularity: str = "module"  # "block" = per-transformer-block (models/unet.py)
    scan_blocks: bool = False  # lax.scan the transformer stacks (models/unet.py)

    def __post_init__(self):
        object.__setattr__(
            self, "_student",
            UNet2DCondition(self.unet_cfg, self.dtype, self.lora, self.remat,
                            self.remat_policy, self.remat_levels,
                            remat_granularity=self.remat_granularity,
                            scan_blocks=self.scan_blocks),
        )
        object.__setattr__(
            self, "_teacher",
            UNet2DCondition(self.unet_cfg, self.dtype, NO_LORA, self.remat,
                            self.remat_policy, self.remat_levels,
                            remat_granularity=self.remat_granularity,
                            scan_blocks=self.scan_blocks),
        )
        object.__setattr__(self, "_vae", AutoencoderKL(self.vae_cfg, self.dtype))
        object.__setattr__(self, "_text", CLIPTextModel(self.text_cfg, self.dtype))
        object.__setattr__(self, "_text2", CLIPTextModel(self.text2_cfg, self.dtype))

    def init(self, rng, image_size: int = None, seq_len: int = 77):
        del image_size
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        image_size = 64
        latent = 16
        d = self.unet_cfg.cross_attention_dim
        x = jnp.zeros((1, latent, latent, self.unet_cfg.in_channels), self.dtype)
        t = jnp.zeros((1,))
        ctx = jnp.zeros((1, seq_len, d), self.dtype)
        added = {
            "text_embeds": jnp.zeros((1, self.text2_cfg.projection_dim), self.dtype),
            "time_ids": jnp.zeros((1, 6)),
        }
        uvars = jax.jit(self._student.init)(r1, x, t, ctx, added)
        vvars = jax.jit(self._vae.init)(r2, jnp.zeros((1, image_size, image_size, 3), self.dtype))
        tvars = jax.jit(self._text.init)(r3, jnp.zeros((1, seq_len), jnp.int32))
        t2vars = jax.jit(self._text2.init)(r4, jnp.zeros((1, seq_len), jnp.int32))
        frozen = {
            "unet": uvars["params"],
            "vae": vvars["params"],
            "text": tvars["params"],
            "text2": t2vars["params"],
        }
        return frozen, uvars["lora"]

    def encode_prompts(self, frozen, input_ids, input_ids_2, time_ids) -> Cond:
        hidden1, _, _ = self._text.apply({"params": frozen["text"]}, input_ids)
        hidden2, _, pooled2 = self._text2.apply({"params": frozen["text2"]}, input_ids_2)
        prompt_embeds = jnp.concatenate([hidden1[-2], hidden2[-2]], axis=-1)
        return {
            "prompt_embeds": prompt_embeds,
            "added_cond": {"text_embeds": pooled2, "time_ids": time_ids},
        }

    def decode_latents(self, frozen, latents, chunk: Optional[int] = None) -> jnp.ndarray:
        return _decode_chunked(self._vae, frozen["vae"], latents, chunk)

    def encode(self, frozen, batch, rng):
        if "prompt_embeds" in batch:  # cached text embeddings (see SD15Bundle)
            prompt_embeds = batch["prompt_embeds"]
            pooled2 = batch["pooled_embeds"]
        else:
            hidden1, _, _ = self._text.apply({"params": frozen["text"]}, batch["input_ids"])
            hidden2, _, pooled2 = self._text2.apply(
                {"params": frozen["text2"]}, batch["input_ids_2"]
            )
            # penultimate hidden states, concat on feature dim (sdxl train:770-809)
            prompt_embeds = jnp.concatenate([hidden1[-2], hidden2[-2]], axis=-1)
            prompt_embeds = jax.lax.stop_gradient(prompt_embeds)
            pooled2 = jax.lax.stop_gradient(pooled2)
        if "latents" in batch:
            latents = batch["latents"]
        else:
            latents = _encode_chunked(
                self._vae, frozen["vae"], batch["pixel_values"], rng,
                self.vae_encode_chunk, self.vae_encode_shards,
            )
            latents = jax.lax.stop_gradient(latents)
        cond = {
            "prompt_embeds": prompt_embeds,
            "added_cond": {"text_embeds": pooled2, "time_ids": batch["time_ids"]},
        }
        # zero uncond embeds + zero pooled, same time_ids (sdxl train:1216-1221)
        uncond = {
            "prompt_embeds": jnp.zeros_like(prompt_embeds),
            "added_cond": {
                "text_embeds": jnp.zeros_like(pooled2),
                "time_ids": batch["time_ids"],
            },
        }
        return latents, cond, uncond

    student = SD15Bundle.student
    teacher = SD15Bundle.teacher
    teacher_features = SD15Bundle.teacher_features


@dataclasses.dataclass(frozen=True)
class SD3Bundle:
    """SD3: dual CLIP pooled concat + (CLIP-concat padded to T5 width, seq
    concat with T5) context (`train_pcm_lora_sd3.py:772-814`)."""

    mmdit_cfg: MMDiTConfig
    vae_cfg: VAEConfig
    text_cfg: CLIPTextConfig  # CLIP-L w/ projection
    text2_cfg: CLIPTextConfig  # bigG w/ projection
    t5_cfg: T5Config
    lora: LoRASpec
    dtype: Any = jnp.bfloat16
    remat: bool = False
    remat_policy: Optional[str] = None  # e.g. "dots" (ops/common.py:resolve_remat_policy)
    vae_encode_chunk: Optional[int] = None  # bound encoder peak (see _encode_chunked)
    vae_encode_shards: int = 1  # data-mesh axis size: chunk is PER SHARD

    def __post_init__(self):
        object.__setattr__(
            self, "_student",
            MMDiT(self.mmdit_cfg, self.dtype, self.lora, self.remat, self.remat_policy),
        )
        object.__setattr__(
            self, "_teacher",
            MMDiT(self.mmdit_cfg, self.dtype, NO_LORA, self.remat, self.remat_policy),
        )
        object.__setattr__(self, "_vae", AutoencoderKL(self.vae_cfg, self.dtype))
        object.__setattr__(self, "_text", CLIPTextModel(self.text_cfg, self.dtype))
        object.__setattr__(self, "_text2", CLIPTextModel(self.text2_cfg, self.dtype))
        object.__setattr__(self, "_t5", T5Encoder(self.t5_cfg, self.dtype))

    def init(self, rng, image_size: int = None, seq_len: int = 77):
        del image_size
        r1, r2, r3, r4, r5 = jax.random.split(rng, 5)
        image_size = 64
        latent = 16
        x = jnp.zeros((1, latent, latent, self.mmdit_cfg.in_channels), self.dtype)
        t = jnp.zeros((1,))
        ctx = jnp.zeros((1, 2 * seq_len, self.mmdit_cfg.joint_attention_dim), self.dtype)
        pooled = jnp.zeros((1, self.mmdit_cfg.pooled_projection_dim), self.dtype)
        uvars = jax.jit(self._student.init)(r1, x, t, ctx, pooled)
        vvars = jax.jit(self._vae.init)(r2, jnp.zeros((1, image_size, image_size, 3), self.dtype))
        tvars = jax.jit(self._text.init)(r3, jnp.zeros((1, seq_len), jnp.int32))
        t2vars = jax.jit(self._text2.init)(r4, jnp.zeros((1, seq_len), jnp.int32))
        t5vars = jax.jit(self._t5.init)(r5, jnp.zeros((1, seq_len), jnp.int32))
        frozen = {
            "mmdit": uvars["params"],
            "vae": vvars["params"],
            "text": tvars["params"],
            "text2": t2vars["params"],
            "t5": t5vars["params"],
        }
        return frozen, uvars["lora"]

    def _encode_prompt(self, frozen, ids1, ids2, ids3):
        h1, _, p1 = self._text.apply({"params": frozen["text"]}, ids1)
        h2, _, p2 = self._text2.apply({"params": frozen["text2"]}, ids2)
        clip_seq = jnp.concatenate([h1[-2], h2[-2]], axis=-1)
        pooled = jnp.concatenate([p1, p2], axis=-1)
        t5_seq = self._t5.apply({"params": frozen["t5"]}, ids3)
        pad = self.mmdit_cfg.joint_attention_dim - clip_seq.shape[-1]
        clip_seq = jnp.pad(clip_seq, ((0, 0), (0, 0), (0, pad)))
        prompt_embeds = jnp.concatenate([clip_seq, t5_seq.astype(clip_seq.dtype)], axis=1)
        return prompt_embeds, pooled

    def encode_prompts(self, frozen, input_ids, input_ids_2, input_ids_3) -> Cond:
        prompt_embeds, pooled = self._encode_prompt(frozen, input_ids, input_ids_2, input_ids_3)
        return {"prompt_embeds": prompt_embeds, "pooled": pooled}

    def decode_latents(self, frozen, latents, chunk: Optional[int] = None) -> jnp.ndarray:
        return _decode_chunked(self._vae, frozen["vae"], latents, chunk)

    def encode(self, frozen, batch, rng):
        if "prompt_embeds" in batch:  # cached text embeddings (see SD15Bundle)
            prompt_embeds = batch["prompt_embeds"]
            pooled = batch["pooled_embeds"]
        else:
            prompt_embeds, pooled = self._encode_prompt(
                frozen, batch["input_ids"], batch["input_ids_2"], batch["input_ids_3"]
            )
            prompt_embeds = jax.lax.stop_gradient(prompt_embeds)
            pooled = jax.lax.stop_gradient(pooled)
        if "latents" in batch:
            latents = batch["latents"]
        else:
            # SD3 keeps the VAE in fp32 (`train_pcm_lora_sd3.py:954`)
            latents = _encode_chunked(
                self._vae, frozen["vae"], batch["pixel_values"], rng,
                self.vae_encode_chunk, self.vae_encode_shards,
            )
            latents = jax.lax.stop_gradient(latents)
        cond = {"prompt_embeds": prompt_embeds, "pooled": pooled}
        uncond = {
            "prompt_embeds": batch["uncond_embeds"],
            "pooled": batch["uncond_pooled"],
        }
        return latents, cond, uncond

    def student(self, frozen, lora, x, t, cond):
        return self._student.apply(
            {"params": frozen["mmdit"], "lora": lora}, x, t,
            cond["prompt_embeds"], cond["pooled"],
        )

    def teacher(self, frozen, x, t, cond):
        return self._teacher.apply(
            {"params": frozen["mmdit"]}, x, t, cond["prompt_embeds"], cond["pooled"]
        )

    def teacher_features(self, frozen, x, t, cond, stop_after_mid: bool = False):
        _, feats = self._teacher.apply(
            {"params": frozen["mmdit"]}, x, t, cond["prompt_embeds"], cond["pooled"],
            mutable=["features"],
        )
        return {k: v[0] for k, v in feats["features"].items()}


def init_frozen_cpu(bundle, rng, cast_dtype=jnp.bfloat16):
    """Initialize a bundle's param trees on the host CPU backend.

    The axon TPU remote compiler struggles with billion-parameter init
    graphs; CPU init is fast and the frozen tree is cast (default bf16 —
    the reference's mixed-precision weight_dtype policy) before being moved
    to devices by the first jitted use.
    """
    from ..ops.common import reference_ops

    # local_devices, not devices: under multi-process jax.distributed the
    # first GLOBAL cpu device may belong to another process, and eager ops on
    # arrays placed there raise "Cannot reshard an input that is not fully
    # addressable" (observed in tests/test_multiprocess.py)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu), reference_ops():
        frozen, lora = bundle.init(rng)
    if cast_dtype is not None:
        frozen = jax.tree.map(
            lambda x: x.astype(cast_dtype) if x.dtype == jnp.float32 else x, frozen
        )
    return frozen, lora


def init_frozen_fast(bundle, seed: int = 0, cast_dtype=jnp.bfloat16):
    """Structure-only initialization: `jax.eval_shape` the bundle's init (no
    XLA compile at all) and fill parameters host-side with numpy.

    Weight values follow simple fan-in scaling — correct enough for
    throughput benchmarking and infrastructure smoke runs; real training
    restores ported checkpoints over this structure anyway.
    """
    import numpy as np

    from ..ops.common import reference_ops

    with reference_ops():
        shapes = jax.eval_shape(lambda r: bundle.init(r), jax.random.PRNGKey(0))
    frozen_s, lora_s = shapes
    rng = np.random.default_rng(seed)

    def np_dtype(d):
        # pure-numpy leaves: one XLA-CPU dispatch per leaf (jnp.asarray) cost
        # ~25 min of single-core wall on SDXL in round 1; numpy+ml_dtypes
        # casting is C-speed and device_put consumes np arrays directly
        return np.dtype(d)

    def fill(path, sds):
        name = jax.tree_util.keystr(path).lower()
        shape, dtype = sds.shape, sds.dtype
        if cast_dtype is not None and dtype == jnp.float32:
            dtype = cast_dtype
        dtype = np_dtype(dtype)
        if not shape:
            return np.zeros((), dtype)
        if "'scale'" in name or "'weight'" in name and len(shape) == 1:
            return np.ones(shape, dtype)
        if "'bias'" in name or name.endswith("['b']"):
            return np.zeros(shape, dtype)
        fan_in = int(np.prod(shape[:-1])) if len(shape) > 1 else shape[0]
        std = 1.0 / max(fan_in, 1) ** 0.5
        arr = rng.standard_normal(size=shape, dtype=np.float32) * np.float32(std)
        return arr.astype(dtype) if arr.dtype != dtype else arr

    frozen = jax.tree_util.tree_map_with_path(fill, frozen_s)
    lora = jax.tree_util.tree_map_with_path(
        lambda p, sds: fill(p, sds) if not jax.tree_util.keystr(p).endswith("['b']")
        else np.zeros(sds.shape, np.float32),
        lora_s,
    )
    # lora params stay fp32 (master weights)
    lora = jax.tree.map(lambda x: np.asarray(x, np.float32), lora)
    return frozen, lora
