"""Shared helpers for Pallas TPU kernels."""

from __future__ import annotations

import contextlib
import contextvars
import functools
import os
import re

import jax

_FORCE_REFERENCE = contextvars.ContextVar("pcm_force_reference_ops", default=False)


@contextlib.contextmanager
def reference_ops():
    """Force the XLA-oracle implementations (no Pallas) within the context —
    used when tracing for the CPU backend while a TPU is the default
    (e.g. host-side param initialization)."""
    tok = _FORCE_REFERENCE.set(True)
    try:
        yield
    finally:
        _FORCE_REFERENCE.reset(tok)


def force_reference_ops() -> bool:
    return _FORCE_REFERENCE.get()


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


_ELEMENTWISE_IMPL = contextvars.ContextVar("pcm_elementwise_impl", default=None)


@contextlib.contextmanager
def elementwise_impl(name: str):
    """Select the GEGLU/GroupNorm implementation for code traced within the
    context. Flash attention is unaffected.

    "pallas"  — both ops use the Pallas kernels (train-graph default)
    "xla"     — both inline into XLA fusions (inference-trace default)
    "xla_gn"  — GroupNorm inlines into XLA, GEGLU keeps the Pallas kernel:
                the remote-compiler SIGKILL on remat'd train graphs was
                attributed to the ~70 inlined GEGLU dot_generals, so this
                probes the GroupNorm half of the XLA win independently
    """
    assert name in ("pallas", "xla", "xla_gn"), name
    tok = _ELEMENTWISE_IMPL.set(name)
    try:
        yield
    finally:
        _ELEMENTWISE_IMPL.reset(tok)


def pallas_elementwise(kind: str = "geglu") -> bool:
    """Whether ``kind`` ("geglu" | "groupnorm") uses the Pallas kernel at
    this trace point.

    Isolated fenced v5e measurements (scripts/tune_elementwise.py,
    2026-08-16) show XLA's fused matmul-epilogue GEGLU ~1.9x faster fwd+bwd
    and its GroupNorm+SiLU faster at 3 of 4 SDXL shapes — so inference
    paths (TextToImagePipeline) trace under elementwise_impl("xla").
    The remat'd TRAIN step keeps the Pallas kernels: inlining the ~70 GEGLU
    dot_generals into the 4-forward remat graph reproducibly SIGKILLs the
    remote TPU compiler host (2x verified), and the opaque pallas_call
    boundary is what keeps that graph compilable. Flash attention is
    independent of this switch (Pallas, 6-7x faster than XLA at seq 4096).
    PCM_PALLAS_ELEMENTWISE=1/0 globally overrides both defaults.
    """
    env = os.environ.get("PCM_PALLAS_ELEMENTWISE")
    if env is not None:
        return env == "1"
    ctx = _ELEMENTWISE_IMPL.get()
    if ctx == "xla_gn":
        return kind == "geglu"
    if ctx is not None:
        return ctx == "pallas"
    return True


@functools.cache
def interpret_default() -> bool:
    """Run kernels in interpreter mode when no TPU is present (CPU tests)."""
    return jax.default_backend() != "tpu"


def resolve_remat_policy(name):
    """Map a policy name to a jax.checkpoint policy for nn.remat.

    "dots": keep matmul/einsum outputs resident across the bwd pass and
    recompute only the cheap elementwise/norm ops — trades HBM for a much
    cheaper recompute than the default save-nothing policy. Convs are still
    recomputed (they are not dots), which is the right trade for UNets where
    the transformer stacks dominate FLOPs.
    """
    if name is None:
        return None
    if name.endswith("+fa"):
        # additionally save the flash-attention out+lse residuals (named in
        # ops/flash_attention.py:_flash_fwd_rule): the backward recompute
        # then DCEs the O(S^2) forward kernels. Costs ~o-sized residency per
        # attention call; pair with a dots cap that leaves the headroom.
        base = resolve_remat_policy(name[: -len("+fa")])
        return jax.checkpoint_policies.save_from_both_policies(
            base,
            jax.checkpoint_policies.save_only_these_names("fa_out", "fa_lse"),
        )
    policies = {
        "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        "dots_small": _dots_below(16 * 2**20),
        "nothing": jax.checkpoint_policies.nothing_saveable,
    }
    if name not in policies:
        # parametrized cap: "dots<N>m" saves dot outputs <= N MiB (the knob
        # that scales dots_small down when batch size scales residuals up)
        m = re.fullmatch(r"dots(\d+)m", name)
        if m:
            return _dots_below(int(m.group(1)) * 2**20)
    return policies[name]


def _dots_below(max_bytes: int):
    """Checkpoint policy: save non-batched dot_general outputs no larger than
    ``max_bytes``; recompute everything else. The wide GEGLU inner projections
    (e.g. 4096x5120 bf16 = 40MB each) are cheap to recompute but dominate
    saved-residual HBM under plain dots_saveable — capping the saved size keeps
    the fast-backward benefit within the v5e's 16G budget."""
    import numpy as np
    from jax import lax

    def policy(prim, *avals, **params):
        if prim is not lax.dot_general_p:
            return False
        (_, _), (lhs_b, rhs_b) = params["dimension_numbers"]
        if lhs_b or rhs_b:
            return False
        out = prim.abstract_eval(*avals, **params)
        aval = out[0] if isinstance(out, tuple) else out
        if isinstance(aval, (list, tuple)):
            aval = aval[0]
        return int(np.prod(aval.shape)) * aval.dtype.itemsize <= max_bytes

    return policy
