#!/usr/bin/env python
"""Train a PCM-LoRA student — the CLI equivalent of the reference's
``accelerate launch train_pcm_lora_*.py`` entry points.

Example (mirrors `train_pcm_lora_sd15.sh` recipe 1):
  python scripts/train.py --recipe sd15_4phase \
      --train-data-dir /data/cc3m --output-dir runs/sd15_4phase \
      --teacher-checkpoint ckpts/sd15  # orbax dir with ported HF weights

Without --teacher-checkpoint, models are randomly initialized (smoke runs).
Multi-host: run one process per host with JAX_COORDINATOR_ADDRESS etc. set;
the data loader shards per process and the mesh spans all chips.
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pcm_tpu.utils.cachedirs import setup_compile_cache

setup_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--recipe", required=True)
    ap.add_argument("--train-data-dir", default=None)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--teacher-checkpoint", default=None,
                    help="orbax dir holding the frozen param trees")
    ap.add_argument("--tokenizer-dir", default=None,
                    help="tokenizer dir — a transformers dir, a pipeline root "
                         "with tokenizer{,_2,_3}/ subdirs, or one holding "
                         "vocab.json+merges.txt (native C++ CLIP BPE)")
    ap.add_argument("--allow-hash-tokenizer", action="store_true",
                    help="permit the pseudo-random HashTokenizer when no "
                         "--tokenizer-dir is given (smoke runs ONLY: text "
                         "conditioning is garbage)")
    ap.add_argument("--max-train-steps", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None, help="per-chip batch")
    ap.add_argument("--resolution", type=int, default=None)
    ap.add_argument("--checkpointing-steps", type=int, default=500)
    ap.add_argument("--checkpoints-total-limit", type=int, default=5)
    ap.add_argument("--validation-steps", type=int, default=500)
    ap.add_argument("--log-every", type=int, default=10,
                    help="metrics cadence; also the async-dispatch window "
                         "(metrics are only materialized at log boundaries)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--multihost", action="store_true")
    ap.add_argument("--dataloader-workers", type=int, default=16)
    ap.add_argument("--cached-latents-dir", default=None,
                    help="dir of shard_*.npz from scripts/cache_latents.py; "
                         "skips VAE/text encoders inside the train step")
    ap.add_argument("--offload-encoders", action="store_true",
                    help="(cached-latents mode) after the one-time setup "
                         "encodes, DROP the VAE/text tower params from the "
                         "step's frozen tree — frees ~1 GiB HBM at SDXL scale "
                         "for looser --remat caps / bigger batch (the bench.py "
                         "cached-latents headline envelope). A host copy of "
                         "the VAE is re-uploaded per validation call (the "
                         "text conds are pre-encoded at setup)")
    ap.add_argument("--gradient-accumulation-steps", type=int, default=1)
    ap.add_argument("--use-8bit-adam", action="store_true",
                    help="blockwise int8 Adam moments (ref --use_8bit_adam)")
    ap.add_argument("--optimizer", default="adamw", choices=["adamw", "prodigy"],
                    help="student optimizer; prodigy is parameter-free — pair "
                         "it with --learning-rate 1.0 (ref SD3 trainers)")
    ap.add_argument("--learning-rate", type=float, default=None,
                    help="override the recipe learning rate")
    ap.add_argument("--lr-scheduler", default="constant",
                    choices=["constant", "cosine"],
                    help="LR schedule (ref --lr_scheduler, "
                         "train_pcm_lora_sd15.py:1026-1033)")
    ap.add_argument("--lr-warmup-steps", type=int, default=0,
                    help="linear LR warmup steps (ref --lr_warmup_steps)")
    ap.add_argument("--adv-pairing", default="fresh", choices=["fresh", "fused"],
                    help="adversarial step pairing: 'fresh' (default) = the "
                         "reference's alternation, D and G each on their own "
                         "batch (train_pcm_lora_sdxl_adv.py:1482-1532); "
                         "'fused' = one batch feeds both updates through a "
                         "single prepare + joint backward (~2/3 the compute "
                         "per pair, same update count; counts as 2 steps — "
                         "use even step cadences)")
    ap.add_argument("--split-d", action="store_true",
                    help="compile the adversarial D step as two smaller XLA "
                         "programs (feature pass + head update; bit-identical "
                         "math) — use when the monolithic D graph is too big "
                         "for the compiler")
    ap.add_argument("--frozen-weights", default="bf16", choices=["bf16", "int8"],
                    help="int8 = store frozen teacher/text kernels as "
                         "weight-only quantized int8 (per-channel scales; VAE "
                         "stays bf16) — frees HBM for lighter --remat")
    ap.add_argument("--int8-no-grad-fwd", action="store_true",
                    help="alias for --int8-matmul scoped (kept for "
                         "compatibility)")
    ap.add_argument("--int8-matmul", default=None,
                    choices=["scoped", "dense", "fused"],
                    help="compute QTensor-weighted dense matmuls on the int8 "
                         "MXU path (requires --frozen-weights int8). "
                         "'scoped' = only the gradient-free forwards (CFG "
                         "teacher + stop-grad target); the differentiated "
                         "student keeps exact bf16 math. 'dense' = every "
                         "frozen dense dot incl. the student forward "
                         "(QLoRA-style W8A8; LoRA + convs stay bf16 — the "
                         "bench.py SDXL headline config, 2336 ms vs 2444 ms "
                         "bf16 at bs4/1024px). 'fused' = the Pallas in-VMEM "
                         "activation-quant kernel incl. pointwise convs "
                         "(measured REGRESSION on full SDXL graphs, "
                         "docs/PERF.md — bisect only). dense/fused also "
                         "apply to validation sampling (same dispatch "
                         "context for the whole run)")
    ap.add_argument("--elementwise", default=None,
                    choices=["pallas", "xla", "xla_gn"],
                    help="force the GEGLU/GroupNorm implementation for every "
                         "graph this run traces (ops/common.py dispatch). "
                         "'xla' matches the SDXL bench headline graphs so "
                         "the compile cache is shared with bench.py; default "
                         "keeps the per-module measured defaults")
    ap.add_argument("--vae-encode-chunk", type=int, default=None,
                    help="VAE-encode this many samples at a time inside the "
                         "jitted step (default: 1 at >=1024px when batch>1 - "
                         "the encoder's first convs are the HBM peak there; "
                         "0 disables). Mirrors the reference's chunked VAE "
                         "encode (sd15 train:1127-1135).")
    ap.add_argument("--remat", default="full",
                    help="gradient checkpointing: full=min memory, dots/"
                         "dots_small/dots<N>m=keep (<=N MiB) matmul outputs "
                         "for a faster bwd, none=fastest (needs HBM)")
    ap.add_argument("--remat-gran", default="block", choices=["module", "block"],
                    help="UNet transformer checkpoint boundary (models/"
                         "unet.py): 'block' (default) bounds the backward "
                         "peak to one BasicTransformerBlock; 'module' is the "
                         "historical whole-Transformer2D region")
    ap.add_argument("--scan-blocks", action="store_true",
                    help="lax.scan the UNet transformer stacks (one traced "
                         "block per stack; models/unet.py scan_blocks) — "
                         "several-fold smaller/faster compiles, matching the "
                         "bench headline graphs. Kohya exports are identical "
                         "either way (lora/kohya.py expands the scan layout); "
                         "SD1.5/SDXL only")
    ap.add_argument("--tiny", action="store_true",
                    help="swap every model for its TINY_* config: a seconds-"
                         "long end-to-end smoke of the full CLI path (data, "
                         "step compile, checkpointing, validation) on CPU")
    ap.add_argument("--validation-prompts", nargs="*", default=[
        "portrait photo of a girl, photograph, highly detailed face, depth of field",
        "Self-portrait oil painting, a beautiful cyborg with golden hair, 8k",
        "Astronaut in a jungle, cold color palette, muted colors, detailed, 8k",
        "A photo of beautiful mountain with realistic sunset and blue lake, highly detailed, masterpiece",
    ])
    args = ap.parse_args()
    if not args.train_data_dir and not args.cached_latents_dir:
        ap.error("one of --train-data-dir / --cached-latents-dir is required")
    if args.offload_encoders and not args.cached_latents_dir:
        ap.error("--offload-encoders requires --cached-latents-dir (the "
                 "train step must not need the encoder towers)")

    if args.multihost:
        from pcm_tpu.parallel.mesh import init_distributed

        init_distributed()

    use_remat = args.remat != "none"
    policy = args.remat if args.remat.startswith("dots") else None
    if policy is not None:
        from pcm_tpu.ops.common import resolve_remat_policy

        resolve_remat_policy(policy)  # validate the name before building

    from pcm_tpu.configs.families import RECIPES, sd3_bundle, sd15_bundle, sdxl_bundle
    from pcm_tpu.core import make_ddpm_schedule, make_flow_schedule
    from pcm_tpu.data.dataset import DataLoader, ImageFolderDataset, make_collate, shard_for_process
    from pcm_tpu.parallel.mesh import make_mesh, replicate
    from pcm_tpu.train.adv import (
        SD3_DISC_CONFIG,
        SD15_DISC_CONFIG,
        SDXL_DISC_CONFIG,
        AdvConfig,
        Discriminator,
        build_ddim_adv_steps,
        build_flow_adv_steps,
        init_discriminator,
    )
    from pcm_tpu.train.distill import build_ddim_distill_step, build_flow_distill_step
    from pcm_tpu.train.loop import LoopConfig, Trainer
    from pcm_tpu.train.state import TrainState, make_optimizer

    recipe = RECIPES[args.recipe]
    if args.int8_no_grad_fwd and args.int8_matmul is None:
        args.int8_matmul = "scoped"
    if args.int8_matmul:
        if args.frozen_weights != "int8":
            raise SystemExit(f"--int8-matmul {args.int8_matmul} requires "
                             "--frozen-weights int8 (it quantizes activations "
                             "against QTensor kernels)")
        if args.int8_matmul == "scoped":
            import dataclasses as _dc

            recipe = _dc.replace(
                recipe, distill=_dc.replace(recipe.distill, int8_no_grad_fwd=True)
            )
    res = args.resolution or recipe.resolution
    batch = args.batch_size or recipe.batch_per_chip
    max_steps = args.max_train_steps or recipe.max_steps

    # --- bundle + schedule ---
    enc_chunk = args.vae_encode_chunk
    if enc_chunk is None and res >= 1024 and batch > 1:
        enc_chunk = 1  # encoder first-convs are the HBM peak (docs/PERF.md)
    # encode chunk is PER DATA SHARD (bundles._encode_chunked interleaves the
    # global batch so no device idles during the chunked encode)
    enc_shards = jax.device_count()
    if recipe.family == "sd15":
        bundle = sd15_bundle(recipe.lora_rank, remat=use_remat, remat_policy=policy,
                             tiny=args.tiny, vae_encode_chunk=enc_chunk,
                             vae_encode_shards=enc_shards,
                             remat_granularity=args.remat_gran,
                             scan_blocks=args.scan_blocks)
        schedule = make_ddpm_schedule()
        build_plain, build_adv = build_ddim_distill_step, build_ddim_adv_steps
        disc_cfg = SD15_DISC_CONFIG
        tok_keys = ["input_ids"]
    elif recipe.family == "sdxl":
        bundle = sdxl_bundle(recipe.lora_rank, remat=use_remat, remat_policy=policy,
                             tiny=args.tiny, vae_encode_chunk=enc_chunk,
                             vae_encode_shards=enc_shards,
                             remat_granularity=args.remat_gran,
                             scan_blocks=args.scan_blocks)
        schedule = make_ddpm_schedule()
        build_plain, build_adv = build_ddim_distill_step, build_ddim_adv_steps
        disc_cfg = SDXL_DISC_CONFIG
        tok_keys = ["input_ids", "input_ids_2"]
    else:
        if args.scan_blocks:
            ap.error("--scan-blocks applies to the UNet families (sd15/sdxl)")
        bundle = sd3_bundle(recipe.lora_rank, adv_targets=recipe.adversarial,
                            remat=use_remat, remat_policy=policy,
                            stochastic=recipe.stochastic, tiny=args.tiny,
                            vae_encode_chunk=enc_chunk,
                            vae_encode_shards=enc_shards)
        schedule = make_flow_schedule(shift=3.0)
        build_plain, build_adv = build_flow_distill_step, build_flow_adv_steps
        disc_cfg = SD3_DISC_CONFIG
        tok_keys = ["input_ids", "input_ids_2", "input_ids_3"]
    # latent downscale follows the VAE depth (8x for the real SD VAEs,
    # 2x for TINY_VAE_CONFIG under --tiny)
    vae_scale = 2 ** (len(bundle.vae_cfg.block_out_channels) - 1)
    if args.tiny:
        # tiny discriminator taps: the 2-level TINY UNets expose
        # down_0/down_1/mid/up_0/up_1; TINY_MMDIT has 2 blocks
        from pcm_tpu.train.adv import DiscriminatorConfig

        if recipe.family == "sd3":
            disc_cfg = DiscriminatorConfig(taps=("block_0", "block_1"))
        elif recipe.family == "sdxl":
            disc_cfg = DiscriminatorConfig(taps=("down_0", "down_1", "mid"))
        else:
            disc_cfg = DiscriminatorConfig(
                taps=("down_0", "down_1", "mid", "up_0", "up_1"),
                num_h_per_head=4, kernel=3,
            )

    # --- params ---
    from pcm_tpu.train.bundles import init_frozen_cpu

    frozen, lora = init_frozen_cpu(bundle, jax.random.PRNGKey(args.seed))
    if args.teacher_checkpoint:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        frozen = ckptr.restore(os.path.abspath(args.teacher_checkpoint), frozen)
    if args.frozen_weights == "int8":
        from pcm_tpu.utils.quant import quantize_frozen

        frozen = quantize_frozen(frozen)

    n_dev = jax.device_count()
    mesh = make_mesh(data=n_dev, fsdp=1) if n_dev > 1 else None

    # grad accumulation is scan-based inside the jitted step (one optimizer
    # update per `step()` call, microbatch-sized activations), replacing the
    # reference's accelerator.accumulate — see train/distill.py:accumulate_grads
    accum = args.gradient_accumulation_steps
    lr = args.learning_rate if args.learning_rate is not None else recipe.lr
    if args.optimizer == "prodigy" and args.use_8bit_adam:
        print("warning: --use-8bit-adam is ignored with --optimizer prodigy "
              "(ref train_pcm_lora_sd3.py:1094-1098)", file=sys.stderr)
    if args.optimizer == "prodigy" and lr <= 0.1:
        print("warning: with prodigy set the learning rate around 1.0 "
              "(ref train_pcm_lora_sd3.py:1131-1134)", file=sys.stderr)
    tx_g = make_optimizer(
        lr, max_grad_norm=1.0,
        use_8bit=args.use_8bit_adam and args.optimizer == "adamw",
        optimizer=args.optimizer,
        warmup_steps=args.lr_warmup_steps,
        schedule=args.lr_scheduler,
        total_steps=max_steps,
    )
    g_state = TrainState.create(lora, tx_g)

    # --- data ---
    # tokenizers are needed even in cached-latents mode (one-time uncond
    # empty-prompt encode below)
    from pcm_tpu.data.tokenizer import resolve_tokenizers

    try:
        # --tiny IS the smoke mode, so it implies the hash fallback
        toks = resolve_tokenizers(args.tokenizer_dir, tok_keys,
                                  allow_hash=args.allow_hash_tokenizer or args.tiny)
    except FileNotFoundError as e:
        ap.error(str(e))
    if args.cached_latents_dir:
        from pcm_tpu.data.dataset import CachedLatentsDataset, cached_collate

        ds = CachedLatentsDataset(args.cached_latents_dir)

        def collate(samples):
            b = cached_collate(samples)
            # npz stores bf16 tensors as fp16; promote for the bf16 cast in-step
            return {k: v.astype(np.float32) if v.dtype == np.float16 else v
                    for k, v in b.items()}
    else:
        ds = ImageFolderDataset(
            args.train_data_dir,
            resolution=res,
            crop="random" if recipe.family == "sdxl" else "center",
            proportion_empty_prompts=recipe.proportion_empty_prompts,
            seed=args.seed,
        )
        collate = make_collate(toks, res, sdxl=(recipe.family == "sdxl"))
    if jax.process_count() > 1:
        ds.files = shard_for_process(ds.files, jax.process_index(), jax.process_count())
    # each process loads only its LOCAL rows; shard_batch assembles the
    # global array (mesh.py:_put), so the loader batch is per-process
    local_dev = jax.local_device_count() if mesh is not None else 1
    proc_batch = batch * accum * local_dev
    loader = DataLoader(ds, proc_batch, collate, num_workers=args.dataloader_workers,
                        seed=args.seed)

    # --- uncond embeds (precomputed once, ref sd15 train:1053-1059) ---
    empty_ids = {k: jnp.asarray(toks[k]([""] * proc_batch)) for k in tok_keys}
    if recipe.family == "sd15":
        uncond = bundle.encode_prompts(frozen, empty_ids["input_ids"])
        extra = {"uncond_embeds": uncond["prompt_embeds"]}
    elif recipe.family == "sdxl":
        extra = {}  # zero-tensor uncond built inside the step
    else:
        uncond = bundle.encode_prompts(
            frozen, empty_ids["input_ids"], empty_ids["input_ids_2"], empty_ids["input_ids_3"]
        )
        extra = {
            "uncond_embeds": uncond["prompt_embeds"],
            "uncond_pooled": uncond["pooled"],
        }

    def extra_batch_fn(b):
        b.update(extra)
        return b

    # --- steps ---
    loop_cfg = LoopConfig(
        output_dir=args.output_dir,
        max_train_steps=max_steps,
        checkpointing_steps=args.checkpointing_steps,
        checkpoints_total_limit=args.checkpoints_total_limit,
        validation_steps=args.validation_steps,
        log_every=args.log_every,
        seed=args.seed,
        resume=not args.no_resume,
        kohya_prefix="lora_unet" if recipe.family != "sd3" else "lora_transformer",
    )

    if recipe.adversarial:
        disc = Discriminator(disc_cfg)
        latent_hw = res // vae_scale
        ids0 = {k: v[:1] for k, v in empty_ids.items()}
        if recipe.family == "sd15":
            cond0 = bundle.encode_prompts(frozen, ids0["input_ids"])
        elif recipe.family == "sdxl":
            cond0 = bundle.encode_prompts(
                frozen, ids0["input_ids"], ids0["input_ids_2"],
                jnp.zeros((1, 6), jnp.float32),
            )
        else:
            cond0 = bundle.encode_prompts(
                frozen, ids0["input_ids"], ids0["input_ids_2"], ids0["input_ids_3"]
            )
        d_params = init_discriminator(
            disc, bundle, frozen, jax.random.PRNGKey(args.seed + 1), latent_hw, cond0
        )
        tx_d = make_optimizer(recipe.adv_lr, b1=0.0, max_grad_norm=1.0)
        d_state = TrainState.create(d_params, tx_d)
        if args.adv_pairing == "fused":
            if args.split_d:
                ap.error("--split-d applies to --adv-pairing fresh only "
                         "(the fused pair is already one graph)")
            from pcm_tpu.train.adv import (
                build_ddim_adv_fused_pair,
                build_flow_adv_fused_pair,
            )

            fused_builder = (
                build_flow_adv_fused_pair if recipe.family == "sd3"
                else build_ddim_adv_fused_pair
            )
            pair = fused_builder(
                bundle, schedule, recipe.distill, AdvConfig(recipe.adv_weight),
                disc, tx_g, tx_d, grad_accum_steps=accum,
            )
            trainer = Trainer(
                loop_cfg, frozen, g_state, pair_step=pair, d_state=d_state,
                mesh=mesh,
            )
            steps = None
        else:
            steps = build_adv(
                bundle, schedule, recipe.distill, AdvConfig(recipe.adv_weight), disc, tx_g, tx_d,
                grad_accum_steps=accum,
            )
        if steps is not None and args.split_d:
            if accum > 1:
                ap.error("--split-d does not support gradient accumulation")
            from pcm_tpu.train.adv import (
                build_ddim_adv_d_split,
                build_flow_adv_d_split,
            )

            split_builder = (
                build_flow_adv_d_split if recipe.family == "sd3"
                else build_ddim_adv_d_split
            )
            feats_fn, update_fn = split_builder(
                bundle, schedule, recipe.distill, AdvConfig(recipe.adv_weight),
                disc, tx_d,
            )
            steps = (steps[0], feats_fn, update_fn)
        if steps is not None:
            trainer = Trainer(
                loop_cfg, frozen, g_state, adv_steps=steps, d_state=d_state, mesh=mesh
            )
    else:
        step_fn = build_plain(bundle, schedule, recipe.distill, tx_g, grad_accum_steps=accum)
        trainer = Trainer(loop_cfg, frozen, g_state, step_fn=step_fn, mesh=mesh)

    if mesh is not None:
        trainer.g_state = replicate(trainer.g_state, mesh)
        if trainer.d_state is not None:
            trainer.d_state = replicate(trainer.d_state, mesh)
        trainer.frozen = replicate(frozen, mesh)

    # --- validation: k-step image grid, mirroring ref log_validation ---
    from pcm_tpu.core import make_flow_schedule as _mkf
    from pcm_tpu.sampling import DDIMSampler, PCMFMSampler, TextToImagePipeline

    k = recipe.distill.multiphase
    if recipe.family == "sd3":
        sampler = PCMFMSampler.create(
            _mkf(shift=3.0), k, pcm_timesteps=recipe.distill.num_solver_steps
        )
    else:
        sampler = DDIMSampler.create(schedule, k)
    pipe = TextToImagePipeline(bundle, sampler)
    val_prompts = args.validation_prompts
    if val_prompts:
        # reference parity: 4 images per prompt, at cfg 1 AND 7.5 for
        # SD1.5/SDXL (`train_pcm_lora_sd15.py:166-172,1346-1365`); SD3
        # validates at cfg 1.5 (`train_pcm_lora_sd3.py:1472-1476`). One
        # compiled graph per (cfg on/off); prompts loop outside the jit so
        # the 1024px VAE decode stays within HBM (batch 4 per call).
        images_per_prompt = 4
        val_cfgs = (1.5,) if recipe.family == "sd3" else (1.0, 7.5)

        def _encode_val(texts, n):
            ids = {key: jnp.asarray(toks[key](texts)) for key in tok_keys}
            if recipe.family == "sd15":
                return bundle.encode_prompts(frozen, ids["input_ids"])
            if recipe.family == "sdxl":
                vt = jnp.tile(jnp.asarray([[res, res, 0, 0, res, res]], jnp.float32),
                              (n, 1))
                return bundle.encode_prompts(
                    frozen, ids["input_ids"], ids["input_ids_2"], vt)
            return bundle.encode_prompts(
                frozen, ids["input_ids"], ids["input_ids_2"], ids["input_ids_3"])

        def _tile(tree):
            return jax.tree.map(
                lambda x: jnp.repeat(x, images_per_prompt, axis=0), tree)

        vconds = [_tile(_encode_val([p], 1)) for p in val_prompts]
        vuncond = _tile(_encode_val([""], 1))

        import functools

        @functools.partial(jax.jit, static_argnums=(4,))
        def gen(f, l, c, r, g):
            u = vuncond if g > 1.0 else None
            return pipe.generate(
                f, l, c, u, r, latent_hw=res // vae_scale, guidance_scale=g,
                decode_chunk=2 if res >= 1024 else None,
            )

        def validation_fn(frozen_, lora_, step_):
            out = {}
            for g in val_cfgs:
                grids = []
                for pi, c in enumerate(vconds):
                    key = jax.random.fold_in(jax.random.PRNGKey(args.seed), 1000 * pi)
                    grids.append(np.asarray(gen(frozen_, lora_, c, key, g)))
                out[f"cfg{g:g}"] = np.concatenate(grids, axis=0)
            return out

        trainer.validation_fn = validation_fn

    if args.offload_encoders:
        # Every consumer of the towers has run: one-time uncond embeds,
        # discriminator head init, and the pre-encoded validation conds
        # (vconds/vuncond above). Dropping the tower params from the frozen
        # tree frees their HBM (the cached-latents step never touches them —
        # the same envelope bench.py's cached-latents headline measures);
        # only the VAE is needed again, per validation call, for the decode —
        # keep a host copy and re-upload on demand (~8 s/call for the SDXL
        # VAE through the remote tunnel, amortized over validation_steps).
        host_vae = (jax.device_get(trainer.frozen["vae"])
                    if "vae" in trainer.frozen else None)
        for tree in ((frozen,) if trainer.frozen is frozen
                     else (frozen, trainer.frozen)):
            # mutate IN PLACE: main's locals and any setup closures keep
            # references to the dict itself, so replacing the values is what
            # actually releases the device arrays (empty subtrees keep the
            # keys so the step's pytree structure stays stable)
            for tower in ("vae", "text", "text2", "text3"):
                if tower in tree:
                    tree[tower] = ()
        inner_val = trainer.validation_fn
        if inner_val is not None and host_vae is not None:
            def offloaded_val(frozen_, lora_, step_):
                full = dict(frozen_)
                full["vae"] = (replicate(host_vae, mesh) if mesh is not None
                               else jax.device_put(host_vae))
                try:
                    return inner_val(full, lora_, step_)
                finally:
                    del full  # the uploaded VAE dies with its last reference

            trainer.validation_fn = offloaded_val

    import contextlib

    run_ctx = contextlib.ExitStack()
    if args.int8_matmul in ("dense", "fused"):
        # trace-time dispatch flag: every QTensor dense dot traced inside
        # (train steps AND validation sampling) takes the int8 MXU path
        from pcm_tpu.utils.quant import int8_matmul

        run_ctx.enter_context(int8_matmul(which=args.int8_matmul))
    if args.elementwise:
        # GEGLU/GroupNorm dispatch for every graph traced in this run —
        # matching the bench graphs' dispatch keeps the compile cache shared
        # between `bench.py` and this CLI (same jaxpr -> same cache entry)
        from pcm_tpu.ops.common import elementwise_impl

        run_ctx.enter_context(elementwise_impl(args.elementwise))
    with run_ctx:
        trainer.run(iter(loader), extra_batch_fn)


if __name__ == "__main__":
    main()
