"""Mesh + sharding helpers — the DDP/NCCL replacement (SURVEY.md §2c).

Data parallelism is expressed as `jax.jit` over a 1-D (or 2-D data×fsdp)
`Mesh`: the batch is sharded along 'data', state is replicated (or
FSDP-sharded along 'fsdp'), and XLA inserts the gradient all-reduce over ICI.
Multi-host (v5e-16 style) works identically — `jax.distributed.initialize`
first, then the same mesh spans hosts and DP gradients ride DCN.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """`jax.distributed.initialize` with explicit-args-or-env resolution —
    the `accelerate launch` replacement (ref `train_pcm_lora_sd15.sh:5`).

    On cloud TPU pods the no-arg form auto-detects the cluster; for manual
    launches (and the 2-process CPU-backend test) the coordinator can be
    passed explicitly or via env: JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID."""
    import os

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        jax.distributed.initialize()


def barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Cross-process barrier over the coordinator's KV store (NOT a device
    collective). Needed before the FIRST collective of a multi-process run:
    gloo (the CPU-backend transport) gives peers only ~30 s to rendezvous,
    and per-process setup/compile skew easily exceeds that on a busy host —
    the KV barrier collapses the skew to milliseconds. No-op single-process."""
    if jax.process_count() == 1:
        return
    try:
        from jax._src import distributed

        client = distributed.global_state.client
    except (ImportError, AttributeError):
        # private-module layout changed under an unpinned jax upgrade
        # (round-3 ADVICE): fall back to the device-collective barrier —
        # slower (it races gloo's connect window on CPU backends) but correct
        client = None
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)
        return
    import jax.numpy as jnp

    jax.block_until_ready(
        jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(
            jnp.ones((jax.local_device_count(),))
        )
    )


def _put(x, s: NamedSharding):
    """device_put that stays correct across processes: single-controller uses
    the fast path; multi-process assembles a global array from this process's
    local rows (batch sharding) or its full copy (replication)."""
    if jax.process_count() == 1:
        return jax.device_put(x, s)
    return jax.make_array_from_process_local_data(s, np.asarray(x))


def make_mesh(
    data: Optional[int] = None, fsdp: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // fsdp
    assert data * fsdp == len(devices), (data, fsdp, len(devices))
    arr = np.asarray(devices).reshape(data, fsdp)
    return Mesh(arr, ("data", "fsdp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Multi-process: each process passes its LOCAL batch rows
    (global_batch * local_device_count / device_count of them)."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: _put(x, s), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Multi-process: every process passes the same full-value leaves (same
    init seed / same restored checkpoint)."""
    s = replicated(mesh)
    return jax.tree.map(lambda x: _put(x, s), tree)


def fsdp_sharding(mesh: Mesh, tree: Any, min_size: int = 2**16) -> Any:
    """Shard the largest axis of each big leaf across 'fsdp'; small leaves
    replicate. Returns a pytree of NamedShardings matching `tree`."""
    n_fsdp = mesh.shape["fsdp"]

    def spec_for(x):
        if n_fsdp == 1 or x.size < min_size:
            return NamedSharding(mesh, P())
        # pick the largest divisible axis
        axes = sorted(range(x.ndim), key=lambda i: -x.shape[i])
        for ax in axes:
            if x.shape[ax] % n_fsdp == 0:
                spec = [None] * x.ndim
                spec[ax] = "fsdp"
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, tree)


def shard_fsdp(tree: Any, mesh: Mesh, min_size: int = 2**16) -> Any:
    shardings = fsdp_sharding(mesh, tree, min_size)
    return jax.tree.map(jax.device_put, tree, shardings)
