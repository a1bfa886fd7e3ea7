"""Repo-local persistent cache locations (round-2 fix: /tmp is wiped between
driver sessions, which cost ~70 min of cold treecache+compile per session)."""

import os

from pcm_tpu.utils import cachedirs


def test_default_root_is_repo_local(monkeypatch):
    monkeypatch.delenv("PCM_CACHE_DIR", raising=False)
    root = cachedirs.cache_root()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    assert root == os.path.join(repo, ".cache")
    assert cachedirs.compile_cache_dir() == os.path.join(root, "jax_cache")
    assert cachedirs.tree_cache_dir() == os.path.join(root, "pcm_tree_cache")


def test_env_override(monkeypatch, tmp_path):
    monkeypatch.setenv("PCM_CACHE_DIR", str(tmp_path))
    assert cachedirs.cache_root() == str(tmp_path)
    assert cachedirs.compile_cache_dir() == str(tmp_path / "jax_cache")


def test_setup_compile_cache_points_jax_at_dir(monkeypatch, tmp_path):
    import jax

    monkeypatch.setenv("PCM_CACHE_DIR", str(tmp_path))
    prev = jax.config.jax_compilation_cache_dir
    try:
        path = cachedirs.setup_compile_cache()
        assert os.path.isdir(path)
        assert jax.config.jax_compilation_cache_dir == path
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
