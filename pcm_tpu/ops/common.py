"""Shared helpers for Pallas TPU kernels."""

from __future__ import annotations

import functools

import jax


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


@functools.cache
def interpret_default() -> bool:
    """Run kernels in interpreter mode when no TPU is present (CPU tests)."""
    return jax.default_backend() != "tpu"
