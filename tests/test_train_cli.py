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


def _run_cli(argv, cwd=REPO):
    # subprocess so the CLI owns its own jax runtime; force CPU through
    # jax.config (the axon site-hook overrides JAX_PLATFORMS env vars)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import sys, runpy; sys.argv = %r;"
        "runpy.run_path(%r, run_name='__main__')"
        % (["train.py"] + argv, os.path.join(REPO, "scripts", "train.py"))
    )
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # single CPU device is enough (and faster)
    return subprocess.run(
        [sys.executable, "-c", code], cwd=cwd, env=env,
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
