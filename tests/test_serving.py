"""Batched-serving tests: engine padding/reproducibility + HTTP batching."""

import base64
import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from pcm_tpu.core import make_ddpm_schedule
from pcm_tpu.data.tokenizer import HashTokenizer
from pcm_tpu.lora.layers import LoRASpec
from pcm_tpu.models.clip import CLIPTextConfig
from pcm_tpu.models.unet import TINY_UNET_CONFIG
from pcm_tpu.models.vae import TINY_VAE_CONFIG
from pcm_tpu.sampling import DDIMSampler
from pcm_tpu.serving import BatchingServer, EngineConfig, InferenceEngine
from pcm_tpu.train.bundles import SD15Bundle, SD_UNET_LORA_TARGETS


def _tiny_engine(batch_size=2, guidance_scale=1.0):
    text_cfg = CLIPTextConfig(
        hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64
    )
    bundle = SD15Bundle(
        unet_cfg=TINY_UNET_CONFIG, vae_cfg=TINY_VAE_CONFIG, text_cfg=text_cfg,
        lora=LoRASpec(rank=4, targets=SD_UNET_LORA_TARGETS), dtype=jnp.float32,
    )
    frozen, _ = bundle.init(jax.random.PRNGKey(0), 32)
    sampler = DDIMSampler.create(make_ddpm_schedule(), 2)
    toks = {"input_ids": HashTokenizer(quiet=True)}
    return InferenceEngine(
        bundle, sampler, frozen, None, toks,
        EngineConfig(batch_size=batch_size, latent_hw=16, resolution=32,
                     guidance_scale=guidance_scale),
    )


@pytest.fixture(scope="module")
def shared_engine():
    return _tiny_engine(batch_size=2)


def test_engine_padding_and_seed_reproducibility(shared_engine):
    engine = shared_engine

    # a padded single-request batch must equal the same request's row in a
    # full batch (per-request init noise; DDIM is deterministic)
    solo = engine.generate_batch(["a red square"], [7])
    assert solo.shape == (1, 32, 32, 3) and solo.dtype == np.uint8
    duo = engine.generate_batch(["a red square", "a blue circle"], [7, 8])
    assert duo.shape == (2, 32, 32, 3)
    np.testing.assert_array_equal(solo[0], duo[0])

    # different seeds must differ
    assert np.any(duo[0] != engine.generate_batch(["a red square"], [9])[0])
    assert engine.stats["pad_rows"] >= 2  # the two solo calls were padded


@pytest.mark.slow
def test_engine_cfg_graph():
    engine = _tiny_engine(batch_size=2, guidance_scale=7.5)
    out = engine.generate_batch(["x", "y"], [0, 1])
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(out.astype(np.float32)).all()


@pytest.mark.slow
def test_http_server_batches_concurrent_requests():
    engine = _tiny_engine(batch_size=2)
    engine.warmup()
    server = BatchingServer(engine, port=0, max_wait_ms=3000.0)
    server.start()
    host, port = server.address
    url = f"http://{host}:{port}"

    results = {}

    def post(i):
        req = urllib.request.Request(
            url + "/generate",
            data=json.dumps({"prompt": f"image {i}", "seed": i}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            results[i] = json.loads(r.read())

    threads = [threading.Thread(target=post, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    with urllib.request.urlopen(url + "/healthz", timeout=10) as resp:
        health = json.loads(resp.read())
    with urllib.request.urlopen(url + "/stats", timeout=10) as resp:
        stats = json.loads(resp.read())
    server.stop()

    assert health["ok"] and health["stats"]["requests"] >= 2
    # observability endpoint: percentiles + occupancy over the rolling window
    assert stats["window"] >= 2 and stats["errors"] == 0
    assert stats["latency_ms"]["p50"] is not None
    assert stats["latency_ms"]["p50"] <= stats["latency_ms"]["p99"]
    assert stats["batch_occupancy"] == 1.0  # both requests rode one full batch
    assert stats["requests_per_s"] > 0
    assert set(results) == {0, 1}
    # with a 3 s window and instant submissions, both rode one device batch
    assert {r["batch_size"] for r in results.values()} == {2}
    for r in results.values():
        img = Image.open(io.BytesIO(base64.b64decode(r["image_b64"])))
        assert img.size == (32, 32)


@pytest.mark.slow
def test_engine_sharded_over_mesh_matches_unsharded(shared_engine):
    """Data-parallel serving: batch sharded over the 8-virtual-device mesh
    must reproduce the single-device engine's images bit-for-bit (same
    per-request init noise; XLA collectives only change layout, not math)."""
    from pcm_tpu.parallel.mesh import make_mesh

    text_cfg = CLIPTextConfig(
        hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64
    )
    bundle = SD15Bundle(
        unet_cfg=TINY_UNET_CONFIG, vae_cfg=TINY_VAE_CONFIG, text_cfg=text_cfg,
        lora=LoRASpec(rank=4, targets=SD_UNET_LORA_TARGETS), dtype=jnp.float32,
    )
    frozen, _ = bundle.init(jax.random.PRNGKey(0), 32)
    sampler = DDIMSampler.create(make_ddpm_schedule(), 2)
    toks = {"input_ids": HashTokenizer(quiet=True)}
    mesh = make_mesh(data=8, fsdp=1)
    engine = InferenceEngine(
        bundle, sampler, frozen, None, toks,
        EngineConfig(batch_size=8, latent_hw=16, resolution=32),
        mesh=mesh,
    )
    prompts = [f"img {i}" for i in range(8)]
    seeds = list(range(8))
    sharded = engine.generate_batch(prompts, seeds)
    assert sharded.shape == (8, 32, 32, 3)

    # single-request path through the shared single-device engine: same seed
    # -> same image row (init noise is per-request, not per-batch)
    solo = shared_engine.generate_batch([prompts[3]], [seeds[3]])
    np.testing.assert_allclose(
        sharded[3].astype(np.int32), solo[0].astype(np.int32), atol=1,
    )


@pytest.mark.slow
def test_engine_sdxl_and_sd3_families():
    """Family dispatch in make_prompt_encoder: SDXL (dual CLIP + time_ids)
    and SD3 (triple towers + PCM-FM sampler) engines generate end-to-end."""
    import dataclasses

    from pcm_tpu.core import make_flow_schedule
    from pcm_tpu.models.mmdit import SD3_LORA_TARGETS, TINY_MMDIT_CONFIG
    from pcm_tpu.models.t5 import TINY_T5_CONFIG
    from pcm_tpu.models.unet import TINY_SDXL_CONFIG
    from pcm_tpu.sampling import PCMFMSampler
    from pcm_tpu.train.bundles import SD3Bundle, SDXLBundle

    # SDXL
    te1 = CLIPTextConfig(hidden_size=16, num_layers=2, num_heads=2,
                         intermediate_size=32)
    te2 = CLIPTextConfig(hidden_size=16, num_layers=2, num_heads=2,
                         intermediate_size=32, projection_dim=32)
    xl = SDXLBundle(
        unet_cfg=TINY_SDXL_CONFIG, vae_cfg=TINY_VAE_CONFIG,
        text_cfg=te1, text2_cfg=te2,
        lora=LoRASpec(rank=4, targets=SD_UNET_LORA_TARGETS), dtype=jnp.float32,
    )
    frozen, _ = xl.init(jax.random.PRNGKey(0), 32, seq_len=16)
    toks = {k: HashTokenizer(quiet=True)
            for k in ("input_ids", "input_ids_2")}
    eng = InferenceEngine(
        xl, DDIMSampler.create(make_ddpm_schedule(), 2), frozen, None, toks,
        EngineConfig(batch_size=2, latent_hw=16, resolution=32),
    )
    out = eng.generate_batch(["xl smoke"], [0])
    assert out.shape == (1, 32, 32, 3)

    # SD3 (stochastic PCM-FM uses the in-loop rng too)
    clip_sd3 = CLIPTextConfig(hidden_size=16, num_layers=2, num_heads=2,
                              intermediate_size=32, projection_dim=16)
    t5_cfg = dataclasses.replace(TINY_T5_CONFIG, d_model=32, d_kv=8, d_ff=64)
    sd3 = SD3Bundle(
        mmdit_cfg=TINY_MMDIT_CONFIG, vae_cfg=TINY_VAE_CONFIG,
        text_cfg=clip_sd3, text2_cfg=clip_sd3, t5_cfg=t5_cfg,
        lora=LoRASpec(rank=4, targets=SD3_LORA_TARGETS), dtype=jnp.float32,
    )
    frozen3, _ = sd3.init(jax.random.PRNGKey(0), 32, seq_len=8)
    toks3 = {k: HashTokenizer(quiet=True)
             for k in ("input_ids", "input_ids_2", "input_ids_3")}
    eng3 = InferenceEngine(
        sd3, PCMFMSampler.create(make_flow_schedule(shift=3.0), 2, stochastic=True),
        frozen3, None, toks3,
        EngineConfig(batch_size=2, latent_hw=16, resolution=32),
    )
    out3 = eng3.generate_batch(["sd3 smoke", "two"], [1, 2])
    assert out3.shape == (2, 32, 32, 3)
    assert np.isfinite(out3.astype(np.float32)).all()


@pytest.mark.slow
@pytest.mark.parametrize("extra_args,n_virtual_devices", [
    ([], None),
    (["--data-parallel", "2"], 8),  # batch sharded over a 2-device data mesh
])
def test_serve_cli_tiny(tmp_path, extra_args, n_virtual_devices):
    """scripts/serve.py end-to-end in --tiny mode: launcher plumbing
    (int8 frozen weights, sampler build, warmup) + live HTTP generate;
    the second case shards the serving batch over a virtual device mesh."""
    import os
    import re
    import subprocess
    import sys
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    argv = ['serve.py', '--family', 'sd15', '--tiny', '--steps', '2',
            '--batch-size', '2', '--resolution', '32', '--port', '0',
            '--weights', 'int8'] + extra_args
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        f"import sys, runpy; sys.argv = {argv!r};"
        f"runpy.run_path({os.path.join(repo, 'scripts', 'serve.py')!r},"
        " run_name='__main__')"
    )
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    if n_virtual_devices:
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={n_virtual_devices}")
    proc = subprocess.Popen(
        [sys.executable, "-u", "-c", code], cwd=repo, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        port = None
        deadline = time.time() + 420
        while time.time() < deadline:
            line = proc.stdout.readline()
            if not line:
                break
            m = re.search(r"serving on http://127\.0\.0\.1:(\d+)", line)
            if m:
                port = int(m.group(1))
                break
        assert port, "server never came up"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"prompt": "cli smoke", "seed": 3}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        img = Image.open(io.BytesIO(base64.b64decode(out["image_b64"])))
        assert img.size == (32, 32)
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def _tiny_lora_engine(batch_size=2):
    """Tiny SD1.5 engine built WITH a zero-init adapter tree (hot-swappable)."""
    text_cfg = CLIPTextConfig(
        hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64
    )
    bundle = SD15Bundle(
        unet_cfg=TINY_UNET_CONFIG, vae_cfg=TINY_VAE_CONFIG, text_cfg=text_cfg,
        lora=LoRASpec(rank=4, targets=SD_UNET_LORA_TARGETS), dtype=jnp.float32,
    )
    frozen, lora_template = bundle.init(jax.random.PRNGKey(0), 32)
    sampler = DDIMSampler.create(make_ddpm_schedule(), 2)
    toks = {"input_ids": HashTokenizer(quiet=True)}
    engine = InferenceEngine(
        bundle, sampler, frozen, lora_template, toks,
        EngineConfig(batch_size=batch_size, latent_hw=16, resolution=32),
    )
    return engine, lora_template


@pytest.mark.slow  # quick-tier budget: see docs/PERF.md 'Test suite budget'
def test_lora_hot_swap(tmp_path):
    """Swapping a kohya adapter into a template-built engine changes the
    output without recompiling, and matches an engine built directly with
    the same adapter; lora=None engines reject swaps."""
    from pcm_tpu.lora.kohya import save_kohya_safetensors

    engine, template = _tiny_lora_engine()
    base = engine.generate_batch(["swap test"], [5])

    # a real (non-zero) adapter: perturb every leaf deterministically
    trained = jax.tree.map(
        lambda x: 0.05 * jax.random.normal(
            jax.random.PRNGKey(hash(str(x.shape)) % 2**31), x.shape, jnp.float32
        ),
        template,
    )
    path = str(tmp_path / "adapter.safetensors")
    save_kohya_safetensors(path, trained, alpha=4.0, dtype=np.float32)

    engine.load_lora(path)
    assert engine.stats["lora_swaps"] == 1 and engine.lora_source == path
    swapped = engine.generate_batch(["swap test"], [5])
    assert np.any(swapped != base), "adapter swap had no effect"

    # reference: engine constructed directly with the loaded tree
    direct, _ = _tiny_lora_engine()
    direct.load_lora(jax.tree.map(lambda x: jnp.asarray(x), engine.lora))
    np.testing.assert_array_equal(
        direct.generate_batch(["swap test"], [5]), swapped
    )

    # no-adapter engines cannot swap (structure change = recompile)
    bare = _tiny_engine(batch_size=2)
    with pytest.raises(ValueError, match="without a LoRA tree"):
        bare.load_lora(path)
    # shape mismatch is rejected before it can trigger a silent recompile
    bad = jax.tree.map(lambda x: jnp.zeros(x.shape + (1,), x.dtype), template)
    with pytest.raises(ValueError, match="structure|shape"):
        engine.load_lora(bad)


@pytest.mark.slow  # quick-tier budget: see docs/PERF.md 'Test suite budget'
def test_lora_swap_guards(tmp_path):
    """Advisor findings: a same-shape wrong-dtype tree must be rejected (it
    would silently recompile the graph), a kohya file whose alpha differs
    from the compiled LoRASpec scale must warn (scale is baked into the
    jitted graph), and named adapters can be unregistered to release HBM."""
    import warnings

    from pcm_tpu.lora.kohya import save_kohya_safetensors

    engine, template = _tiny_lora_engine()
    # dtype-only mismatch (shapes identical)
    bad_dtype = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), template)
    with pytest.raises(ValueError, match="dtype"):
        engine.load_lora(bad_dtype)

    # alpha mismatch: spec is rank=4 alpha=None -> effective alpha 4
    path = str(tmp_path / "alpha8.safetensors")
    save_kohya_safetensors(path, template, alpha=8.0, dtype=np.float32)
    with pytest.warns(UserWarning, match="alpha=8.0 != compiled graph alpha=4"):
        engine.load_lora(path)
    # matching alpha stays quiet
    ok = str(tmp_path / "alpha4.safetensors")
    save_kohya_safetensors(ok, template, alpha=4.0, dtype=np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        engine.load_lora(ok)

    # unregister frees the slot; unknown names raise
    engine.register_adapter("tmp", ok)
    assert engine.adapter_names == ["tmp"]
    engine.unregister_adapter("tmp")
    assert engine.adapter_names == []
    with pytest.raises(KeyError, match="unknown adapter"):
        engine.unregister_adapter("tmp")


@pytest.mark.slow  # quick-tier budget: see docs/PERF.md 'Test suite budget'
def test_http_lora_endpoint(tmp_path):
    from pcm_tpu.lora.kohya import save_kohya_safetensors

    engine, template = _tiny_lora_engine()
    path = str(tmp_path / "adapter.safetensors")
    save_kohya_safetensors(path, template, alpha=4.0, dtype=np.float32)
    server = BatchingServer(engine, port=0, max_wait_ms=10.0)
    server.start()
    host, port = server.address
    req = urllib.request.Request(
        f"http://{host}:{port}/lora",
        data=json.dumps({"path": path}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        out = json.loads(r.read())
    assert out["ok"] and out["swaps"] == 1 and out["lora"] == path

    # missing file -> 400, not a crashed server
    req = urllib.request.Request(
        f"http://{host}:{port}/lora",
        data=json.dumps({"path": str(tmp_path / "nope.safetensors")}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400
    server.stop()


@pytest.mark.slow  # quick-tier budget: see docs/PERF.md 'Test suite budget'
def test_multi_adapter_routing(tmp_path):
    """Named adapters: per-request selection returns the same images as a
    default-swap to that adapter; the HTTP dispatcher batches per adapter
    and rejects unknown names."""
    from pcm_tpu.lora.kohya import save_kohya_safetensors

    engine, template = _tiny_lora_engine(batch_size=2)
    trained = jax.tree.map(
        lambda x: 0.1 * jax.random.normal(
            jax.random.PRNGKey(hash(str(x.shape)) % 2**31), x.shape, jnp.float32
        ),
        template,
    )
    path = str(tmp_path / "styleA.safetensors")
    save_kohya_safetensors(path, trained, alpha=4.0, dtype=np.float32)
    engine.register_adapter("styleA", path)
    assert engine.adapter_names == ["styleA"]

    base = engine.generate_batch(["routing"], [3])
    via_name = engine.generate_batch(["routing"], [3], adapter="styleA")
    assert np.any(via_name != base)
    engine.load_lora(path)  # default-swap to the same weights
    np.testing.assert_array_equal(
        engine.generate_batch(["routing"], [3]), via_name
    )
    with pytest.raises(KeyError, match="unknown adapter"):
        engine.generate_batch(["x"], [0], adapter="nope")

    # HTTP: register via POST /lora {"name": ...}, route via "adapter",
    # and concurrent mixed-adapter requests ride separate device batches
    server = BatchingServer(engine, port=0, max_wait_ms=1500.0)
    server.start()
    host, port = server.address
    url = f"http://{host}:{port}"

    def post(payload, out, key):
        req = urllib.request.Request(
            url + "/lora" if "path" in payload else url + "/generate",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            out[key] = json.loads(r.read())

    out = {}
    post({"path": path, "name": "styleB"}, out, "reg")
    assert out["reg"]["ok"] and "styleB" in out["reg"]["adapters"]

    threads = [
        threading.Thread(target=post, args=({"prompt": "p", "seed": 3}, out, "default")),
        threading.Thread(
            target=post, args=({"prompt": "p", "seed": 3, "adapter": "styleB"}, out, "b")
        ),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # different adapters cannot share a device batch
    assert out["default"]["batch_size"] == 1 and out["b"]["batch_size"] == 1
    # styleB == the default (both hold `trained` after the load_lora above)
    assert out["b"]["image_b64"] == out["default"]["image_b64"]

    with pytest.raises(urllib.error.HTTPError) as ei:
        post({"prompt": "p", "adapter": "ghost"}, out, "ghost")
    assert ei.value.code == 400

    # DELETE /lora/<name> unregisters; unknown names -> 404
    req = urllib.request.Request(url + "/lora/styleB", method="DELETE")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert json.loads(r.read())["adapters"] == ["styleA"]
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(
            urllib.request.Request(url + "/lora/styleB", method="DELETE"),
            timeout=30,
        )
    assert ei.value.code == 404
    server.stop()


def test_http_server_bad_request(shared_engine):
    server = BatchingServer(shared_engine, port=0, max_wait_ms=10.0)
    server.start()
    host, port = server.address
    req = urllib.request.Request(
        f"http://{host}:{port}/generate", data=b'{"seed": 1}',
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400
    server.stop()
