"""Persistent cache locations for compile + weight-tree caches.

Round-2 lesson: both the XLA persistent compile cache and the frozen-weight
treecache lived under /tmp, which is wiped between driver sessions — every
new session paid ~5 min of host init plus ~37 min of remote cold compile
before the first benchmark number. Caches now default to ``<repo>/.cache``
(gitignored), which travels with the repo across sessions; a secondary
mirror under ``/tmp/pcm_cache_backup`` (see ``mirror_to_backup``) covers the
opposite failure — a clean checkout with a surviving /tmp. Resolution picks
the first location that already has content. Override with ``PCM_CACHE_DIR``.
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
BACKUP_ROOT = "/tmp/pcm_cache_backup"


def _has_content(path: str) -> bool:
    try:
        return any(os.scandir(path))
    except OSError:
        return False


def cache_root() -> str:
    env = os.environ.get("PCM_CACHE_DIR")
    if env:
        return env
    return os.path.join(_REPO_ROOT, ".cache")


def _resolve(subdir: str) -> str:
    """Always the repo-local primary. If the primary is empty but the /tmp
    mirror has content (repo was cleaned while /tmp survived), promote the
    mirror's entries into the primary first — the primary stays the single
    write target, so new cache entries never accumulate in the volatile
    location this module exists to escape."""
    primary = os.path.join(cache_root(), subdir)
    backup = os.path.join(BACKUP_ROOT, subdir)
    if not _has_content(primary) and _has_content(backup):
        _link_tree(backup, primary)
    return primary


def _link_tree(src: str, dst: str) -> None:
    """Hard-link (fall back to copy) src's contents into dst, keeping
    whatever dst already has."""
    import shutil

    for dirpath, _dirnames, filenames in os.walk(src):
        rel = os.path.relpath(dirpath, src)
        out = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(out, exist_ok=True)
        for name in filenames:
            s, d = os.path.join(dirpath, name), os.path.join(out, name)
            if os.path.exists(d):
                continue
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)


def compile_cache_dir() -> str:
    return _resolve("jax_cache")


def tree_cache_dir() -> str:
    return _resolve("pcm_tree_cache")


def setup_compile_cache(min_compile_secs: int = 5) -> str:
    """Point JAX's persistent compilation cache at the resolved dir."""
    import jax

    path = compile_cache_dir()
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    return path


def mirror_to_backup() -> None:
    """Hard-link (fall back to copy) the primary caches into the /tmp mirror.
    Cheap insurance run at the end of a session; safe to call repeatedly."""
    for subdir in ("jax_cache", "pcm_tree_cache"):
        src = os.path.join(cache_root(), subdir)
        if not _has_content(src):
            continue
        _link_tree(src, os.path.join(BACKUP_ROOT, subdir))
