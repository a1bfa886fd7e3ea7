#!/usr/bin/env python
"""Precompute VAE latents + text embeddings for a fixed image-folder dataset.

Writes shard_*.npz files consumable by `pcm_tpu.data.dataset.CachedLatentsDataset`;
training with `scripts/train.py --cached-latents-dir <dir>` then skips the
VAE/text towers inside the train step (the bundles' encode slices them out
when the batch carries `latents`/`prompt_embeds`).

The reference re-encodes pixels and captions every step
(`train_pcm_lora_sd15.py:1121-1135`); caching is the standard fixed-dataset
optimization for distillation where the teacher conditioning never changes.

Usage:
  python scripts/cache_latents.py --family sdxl --train-data-dir /data/imgs \
      --output-dir /data/cache --resolution 1024 [--teacher-checkpoint ckpt/] \
      [--tokenizer-dir tok/] [--shard-size 256] [--batch 8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", required=True, choices=["sd15", "sdxl", "sd3"])
    ap.add_argument("--train-data-dir", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--resolution", type=int, default=1024)
    ap.add_argument("--teacher-checkpoint", default=None)
    ap.add_argument("--tokenizer-dir", default=None)
    ap.add_argument("--shard-size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tiny", action="store_true",
                    help="TINY_* model configs (smoke mode, pair with "
                         "`train.py --tiny`)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pcm_tpu.configs.families import sd3_bundle, sd15_bundle, sdxl_bundle
    from pcm_tpu.data.dataset import DataLoader, ImageFolderDataset, make_collate

    from pcm_tpu.train.bundles import init_frozen_fast

    bundle = {
        "sd15": lambda: sd15_bundle(remat=False, tiny=args.tiny),
        "sdxl": lambda: sdxl_bundle(remat=False, tiny=args.tiny),
        "sd3": lambda: sd3_bundle(remat=False, tiny=args.tiny),
    }[args.family]()
    frozen, _ = init_frozen_fast(bundle, seed=args.seed)
    if args.teacher_checkpoint:
        import orbax.checkpoint as ocp

        frozen = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.teacher_checkpoint), frozen
        )
    frozen = jax.device_put(frozen, jax.devices()[0])

    tok_keys = {
        "sd15": ["input_ids"],
        "sdxl": ["input_ids", "input_ids_2"],
        "sd3": ["input_ids", "input_ids_2", "input_ids_3"],
    }[args.family]
    from pcm_tpu.data.tokenizer import resolve_tokenizers

    toks = resolve_tokenizers(args.tokenizer_dir, tok_keys, allow_hash=True)

    ds = ImageFolderDataset(
        args.train_data_dir, resolution=args.resolution,
        crop="random" if args.family == "sdxl" else "center", seed=args.seed,
    )
    collate = make_collate(toks, args.resolution, sdxl=(args.family == "sdxl"))

    @jax.jit
    def encode(frozen, batch):
        # bundle.encode packages the (here-discarded) uncond branch from
        # batch keys on SD1.5/SD3 — feed placeholders so only the cond/latent
        # towers are traced
        batch = dict(batch, uncond_embeds=jnp.zeros((1,), jnp.float32),
                     uncond_pooled=jnp.zeros((1,), jnp.float32))
        latents, cond, _ = bundle.encode(frozen, batch, jax.random.PRNGKey(0))
        out = {"latents": latents}
        if args.family == "sd15":
            out["prompt_embeds"] = cond["prompt_embeds"]
        elif args.family == "sdxl":
            out["prompt_embeds"] = cond["prompt_embeds"]
            out["pooled_embeds"] = cond["added_cond"]["text_embeds"]
            out["time_ids"] = cond["added_cond"]["time_ids"]
        else:
            out["prompt_embeds"] = cond["prompt_embeds"]
            out["pooled_embeds"] = cond["pooled"]
        return out

    os.makedirs(args.output_dir, exist_ok=True)
    buf = []
    shard_i = n_done = 0

    def flush():
        nonlocal buf, shard_i
        if not buf:
            return
        merged = {k: np.concatenate([b[k] for b in buf]) for k in buf[0]}
        path = os.path.join(args.output_dir, f"shard_{shard_i:05d}.npz")
        np.savez(path, **merged)
        print(f"wrote {path} ({next(iter(merged.values())).shape[0]} samples)")
        buf, shard_i = [], shard_i + 1

    # sequential (non-shuffling) pass over the dataset
    for start in range(0, len(ds) - args.batch + 1, args.batch):
        samples = [ds.get(i) for i in range(start, start + args.batch)]
        batch = {k: jnp.asarray(v) for k, v in collate(samples).items()}
        if args.family == "sdxl":
            batch["time_ids"] = batch["time_ids"].astype(jnp.float32)
        out = encode(frozen, batch)
        buf.append({k: np.asarray(v.astype(jnp.float16) if v.dtype == jnp.bfloat16 else v)
                    for k, v in out.items()})
        n_done += args.batch
        if sum(b["latents"].shape[0] for b in buf) >= args.shard_size:
            flush()
    flush()
    print(f"cached {n_done} samples -> {args.output_dir}")


if __name__ == "__main__":
    main()
