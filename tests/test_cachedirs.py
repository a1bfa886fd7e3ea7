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


def test_backup_promotion_and_mirror(monkeypatch, tmp_path):
    """Empty primary + populated /tmp mirror -> mirror entries are PROMOTED
    into the primary, which stays the single write target (ADVICE round-2:
    returning the mirror made new entries accumulate in volatile /tmp);
    mirror_to_backup links primary content into the mirror."""
    primary = tmp_path / "primary"
    backup = tmp_path / "backup"
    monkeypatch.setenv("PCM_CACHE_DIR", str(primary))
    monkeypatch.setattr(cachedirs, "BACKUP_ROOT", str(backup))

    # nothing anywhere -> primary path (to be created by setup)
    assert cachedirs.compile_cache_dir() == str(primary / "jax_cache")

    # mirror has content, primary empty -> primary, with the entry promoted
    (backup / "jax_cache").mkdir(parents=True)
    (backup / "jax_cache" / "entry").write_bytes(b"x")
    assert cachedirs.compile_cache_dir() == str(primary / "jax_cache")
    assert (primary / "jax_cache" / "entry").read_bytes() == b"x"

    # primary gains content -> still primary
    (primary / "jax_cache" / "entry2").write_bytes(b"y")
    assert cachedirs.compile_cache_dir() == str(primary / "jax_cache")

    # mirroring links the primary entry into the backup without clobbering
    (primary / "pcm_tree_cache" / "k").mkdir(parents=True)
    (primary / "pcm_tree_cache" / "k" / "leaf.npy").write_bytes(b"z")
    cachedirs.mirror_to_backup()
    assert (backup / "jax_cache" / "entry2").read_bytes() == b"y"
    assert (backup / "pcm_tree_cache" / "k" / "leaf.npy").read_bytes() == b"z"
    assert (backup / "jax_cache" / "entry").exists()  # untouched


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


def test_compile_lock_reentrant_and_exclusive(tmp_path):
    """compile_lock: reentrant within a process (nested lower/compile pairs
    take it once) and exclusive across holders — the bench-vs-pytest
    serialization that replaces the 'nothing CPU-heavy during compiles'
    notes-file rule (ROUND4_NOTES 16/19)."""
    import fcntl
    import subprocess
    import sys

    from pcm_tpu.utils import compilelock

    lock = tmp_path / "l"
    with compilelock.compile_lock("outer", path=str(lock)):
        with compilelock.compile_lock("inner", path=str(lock)):
            # another process must NOT be able to take it while we hold it
            rc = subprocess.run(
                [sys.executable, "-c",
                 "import fcntl,os,sys;"
                 f"fd=os.open({str(lock)!r}, os.O_CREAT|os.O_RDWR);"
                 "fcntl.flock(fd, fcntl.LOCK_EX|fcntl.LOCK_NB)"],
                capture_output=True,
            ).returncode
            assert rc != 0
    # released on exit: non-blocking acquire now succeeds in-process
    fd = __import__("os").open(str(lock), __import__("os").O_RDWR)
    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    __import__("os").close(fd)
