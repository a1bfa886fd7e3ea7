"""End-to-end smoke of the scripts/train.py CLI in --tiny mode.

Covers the full launcher path the unit tests can't: argparse -> recipe ->
tiny bundle -> dataset/loader -> jitted step over the 8-virtual-device mesh
-> checkpoint + kohya export -> validation grids at cfg {1, 7.5} -> metrics.
(The reference's equivalent surface is `accelerate launch train_pcm_lora_*.py`.)
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_dataset(root, n=8, size=48):
    os.makedirs(root, exist_ok=True)
    for i in range(n):
        arr = (np.random.RandomState(i).rand(size, size, 3) * 255).astype("uint8")
        Image.fromarray(arr).save(os.path.join(root, f"img{i}.jpg"))
        with open(os.path.join(root, f"img{i}.txt"), "w") as f:
            f.write(f"a tiny test image {i}")


def _run_cli(argv, cwd=REPO, script="train.py", input=None):
    # subprocess so the CLI owns its own jax runtime; force CPU through
    # jax.config (the axon site-hook overrides JAX_PLATFORMS env vars)
    path = script if "/" in script else os.path.join("scripts", script)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import sys, runpy; sys.argv = %r;"
        "runpy.run_path(%r, run_name='__main__')"
        % ([os.path.basename(script)] + argv, os.path.join(REPO, path))
    )
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # single CPU device is enough (and faster)
    return subprocess.run(
        [sys.executable, "-c", code], cwd=cwd, env=env, input=input,
        capture_output=True, text=True, timeout=540,
    )


@pytest.mark.slow
def test_train_cli_tiny_sd15(tmp_path):
    data = tmp_path / "data"
    out = tmp_path / "run"
    _make_dataset(str(data))
    r = _run_cli([
        "--recipe", "sd15_4phase", "--tiny",
        "--train-data-dir", str(data), "--output-dir", str(out),
        "--max-train-steps", "4", "--batch-size", "2", "--resolution", "32",
        "--checkpointing-steps", "2", "--validation-steps", "4",
        "--log-every", "1",
        "--dataloader-workers", "2",
        "--validation-prompts", "a tiny test image",
    ])
    assert r.returncode == 0, r.stderr[-3000:]

    # checkpoints + rotation-ready layout
    assert (out / "checkpoints" / "2").is_dir()
    assert (out / "checkpoints" / "4").is_dir()
    # kohya LoRA export per save
    assert (out / "pcm_lora_0000002.safetensors").is_file()
    assert (out / "pcm_lora_0000004.safetensors").is_file()
    # validation grids at both reference cfg scales
    assert (out / "images" / "validation" / "cfg1_0000004.png").is_file()
    assert (out / "images" / "validation" / "cfg7.5_0000004.png").is_file()
    # finite losses in the metrics stream
    rows = [json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()]
    assert rows and all(np.isfinite(row["loss"]) for row in rows if "loss" in row)


def test_eval_fid_cli(tmp_path):
    """scripts/eval_fid.py both modes: precomputed features and image dirs
    with the pixel fallback extractor (identical dirs -> FID ~ 0)."""
    rng = np.random.RandomState(0)
    a = rng.randn(64, 8).astype("float32")
    b = (a + 3.0).astype("float32")
    np.save(tmp_path / "a.npy", a)
    np.save(tmp_path / "b.npy", b)
    r = _run_cli([
        "--features-a", str(tmp_path / "a.npy"),
        "--features-b", str(tmp_path / "b.npy"),
    ], script="eval_fid.py")
    assert r.returncode == 0, r.stderr[-2000:]
    fid_ab = float(r.stdout.split("FID:")[1])
    assert fid_ab > 1.0  # mean shift of 3 in every dim

    gen = tmp_path / "gen"
    _make_dataset(str(gen), n=6, size=40)
    r = _run_cli([
        "--image-dir-a", str(gen), "--image-dir-b", str(gen),
        "--batch", "4", "--resolution", "32",
    ], script="eval_fid.py")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "pixel fallback" in r.stderr  # loudly marked as a smoke metric
    fid_same = float(r.stdout.split("FID:")[1])
    assert abs(fid_same) < 1e-3  # identical dirs


@pytest.mark.slow
def test_train_cli_tiny_int8_dense(tmp_path):
    """--frozen-weights int8 + --int8-matmul dense through the CLI: the
    QLoRA-style W8A8 path the bench headline uses (bench.py default),
    now first-class in production training. Finite losses + checkpoint
    land; --checkpointing-steps 0 / --validation-steps 0 mean 'never'."""
    data = tmp_path / "data"
    out = tmp_path / "run"
    _make_dataset(str(data), n=4)
    r = _run_cli([
        "--recipe", "sd15_4phase", "--tiny",
        "--train-data-dir", str(data), "--output-dir", str(out),
        "--max-train-steps", "3", "--batch-size", "2", "--resolution", "32",
        "--checkpointing-steps", "0", "--validation-steps", "0",
        "--log-every", "1", "--dataloader-workers", "1",
        "--frozen-weights", "int8", "--int8-matmul", "dense",
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    rows = [json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()]
    assert rows and all(np.isfinite(row["loss"]) for row in rows if "loss" in row)
    # 0 means never: no periodic checkpoints, only the final save
    ckpts = sorted(os.listdir(out / "checkpoints"))
    assert ckpts == ["3"], ckpts


@pytest.mark.slow
def test_cache_latents_then_train_from_cache(tmp_path):
    """The fixed-dataset pipeline end-to-end: scripts/cache_latents.py --tiny
    writes shard_*.npz, then scripts/train.py --cached-latents-dir trains
    from them (bundle.encode skips the VAE/text towers)."""
    data = tmp_path / "data"
    cache = tmp_path / "cache"
    out = tmp_path / "run"
    _make_dataset(str(data))
    r = _run_cli([
        "--family", "sd15", "--tiny",
        "--train-data-dir", str(data), "--output-dir", str(cache),
        "--resolution", "32", "--batch", "2", "--shard-size", "4",
    ], script="cache_latents.py")
    assert r.returncode == 0, r.stderr[-3000:]
    shards = sorted(cache.glob("shard_*.npz"))
    assert len(shards) >= 2  # 8 images / shard-size 4
    z = np.load(shards[0])
    assert z["latents"].shape[1:] == (16, 16, 4)  # 32px / tiny-VAE 2x
    assert "prompt_embeds" in z

    r = _run_cli([
        "--recipe", "sd15_4phase", "--tiny",
        "--cached-latents-dir", str(cache), "--output-dir", str(out),
        "--max-train-steps", "4", "--batch-size", "2", "--resolution", "32",
        "--checkpointing-steps", "1000", "--validation-steps", "4",
        "--log-every", "1", "--dataloader-workers", "2",
        # offload: towers leave the step's frozen tree after setup; the
        # validation at step 4 re-uploads the host VAE copy for its decode
        "--offload-encoders",
        "--validation-prompts", "a tiny test image",
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    rows = [json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()]
    assert rows and all(np.isfinite(row["loss"]) for row in rows if "loss" in row)
    # the validation grid rendered through the offloaded-VAE path
    vals = list((out / "images").rglob("*.png"))
    assert vals, "validation images missing under the offloaded-encoder path"


@pytest.mark.slow
def test_demo_cli_tiny(tmp_path):
    """demo/app.py in CLI-fallback mode (gradio absent in the image): a
    prompt on stdin generates demo_out.png through the registry's 2-Step
    DDIM path on tiny models."""
    r = _run_cli(
        ["--family", "sd15", "--tiny"],
        script="demo/app.py", cwd=str(tmp_path),
        input="a tiny smoke prompt\n\n",
    )
    assert r.returncode == 0, r.stderr[-3000:]
    out = tmp_path / "demo_out.png"
    assert out.is_file()
    img = Image.open(out)
    assert img.size == (32, 32)
    assert "safety checker disabled" in r.stdout


@pytest.mark.slow
def test_port_weights_cli_tiny(tmp_path):
    """scripts/port_weights.py end-to-end on tiny configs: fake
    diffusers/transformers-format safetensors in -> orbax frozen tree out,
    bit-identical to the in-process converters."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import jax
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from pcm_tpu.models.unet import TINY_UNET_CONFIG, UNet2DCondition
    from pcm_tpu.models.vae import TINY_VAE_CONFIG, AutoencoderKL
    from test_convert import _flatten, _to_sd

    # UNet + VAE fake diffusers state dicts (same builders as the converter
    # roundtrip tests)
    unet_params = UNet2DCondition(TINY_UNET_CONFIG).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 5, 32)), None,
    )["params"]
    unet_sd = _to_sd(_flatten(unet_params))

    vae_params = AutoencoderKL(TINY_VAE_CONFIG).init(
        jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3))
    )["params"]
    vflat = _flatten(vae_params)
    vae_sd = {}
    for scope in ("encoder", "decoder"):
        sub = {p[1:]: v for p, v in vflat.items() if p[0] == scope}
        vae_sd.update(_to_sd(sub, prefix=scope + "."))
    for qc in ("quant_conv", "post_quant_conv"):
        sub = {p[1:]: v for p, v in vflat.items() if p[0] == qc}
        if sub:
            vae_sd.update(_to_sd({(qc,) + p: v for p, v in sub.items()}))

    # transformers CLIP matching configs/families._TINY_CLIP_SD15
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=49408, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=77, hidden_act="quick_gelu", eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = transformers.CLIPTextModel(hf_cfg).eval()
    clip_sd = {k: v.numpy() for k, v in hf.state_dict().items()
               if "position_ids" not in k}

    for name, sd in [("unet", unet_sd), ("vae", vae_sd), ("text", clip_sd)]:
        save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
                  str(tmp_path / f"{name}.safetensors"))

    out = tmp_path / "ported"
    r = _run_cli([
        "--family", "sd15", "--tiny", "--output", str(out),
        "--unet", str(tmp_path / "unet.safetensors"),
        "--vae", str(tmp_path / "vae.safetensors"),
        "--text", str(tmp_path / "text.safetensors"),
    ], script="port_weights.py")
    assert r.returncode == 0, r.stderr[-3000:]
    assert "ported" in r.stdout

    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(str(out))
    rflat = _flatten(restored["unet"])
    eflat = _flatten(unet_params)
    assert set(rflat) == set(eflat)
    for k in list(eflat)[:5]:
        np.testing.assert_array_equal(np.asarray(rflat[k]), np.asarray(eflat[k]))
    # text tower round-trips through the CLIP converter identically
    from pcm_tpu.models.clip import CLIPTextConfig, convert_clip_torch_state

    cfg = CLIPTextConfig(hidden_size=32, num_layers=2, num_heads=2,
                         intermediate_size=64)
    expected_text = convert_clip_torch_state(hf.state_dict(), cfg)
    tflat, xflat = _flatten(restored["text"]), _flatten(expected_text)
    assert set(tflat) == set(xflat)
    for k in xflat:
        np.testing.assert_array_equal(
            np.asarray(tflat[k]), np.asarray(xflat[k]), err_msg=str(k))


@pytest.mark.slow
def test_train_cli_tiny_sd15_adv_split_d(tmp_path):
    """Adversarial recipe through the CLI with --split-d (the 1024px-scale
    compile workaround) — D/G alternation, discriminator init, both optimizers."""
    data = tmp_path / "data"
    out = tmp_path / "run"
    _make_dataset(str(data))
    r = _run_cli([
        "--recipe", "sd15_2phase_adv", "--tiny", "--split-d",
        "--train-data-dir", str(data), "--output-dir", str(out),
        "--max-train-steps", "4", "--batch-size", "2", "--resolution", "32",
        "--checkpointing-steps", "4", "--validation-steps", "1000",
        "--log-every", "1",
        "--dataloader-workers", "2",
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    rows = [json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()]
    keys = set().union(*(row.keys() for row in rows))
    assert "d_loss" in keys and ("loss" in keys or "loss_cm" in keys)
