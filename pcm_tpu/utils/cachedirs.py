"""Persistent cache locations for compile + weight-tree caches.

Round-2 lesson: both the XLA persistent compile cache and the frozen-weight
treecache lived under /tmp, which is wiped between driver sessions — every
new session paid ~33 min of host init plus ~37 min of remote cold compile
before the first benchmark number. Caches now default to ``<repo>/.cache``
(gitignored), which travels with the repo across sessions. Override with
``PCM_CACHE_DIR``.
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cache_root() -> str:
    return os.environ.get("PCM_CACHE_DIR", os.path.join(_REPO_ROOT, ".cache"))


def compile_cache_dir() -> str:
    return os.path.join(cache_root(), "jax_cache")


def tree_cache_dir() -> str:
    return os.path.join(cache_root(), "pcm_tree_cache")


def setup_compile_cache(min_compile_secs: int = 5) -> str:
    """Point JAX's persistent compilation cache at the repo-local dir."""
    import jax

    path = compile_cache_dir()
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    return path
