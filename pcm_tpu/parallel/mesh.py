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
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


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
