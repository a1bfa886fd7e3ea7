"""Shared helpers for Pallas TPU kernels."""

from __future__ import annotations

import contextlib
import contextvars
import functools

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


@functools.cache
def interpret_default() -> bool:
    """Run kernels in interpreter mode when no TPU is present (CPU tests)."""
    return jax.default_backend() != "tpu"
