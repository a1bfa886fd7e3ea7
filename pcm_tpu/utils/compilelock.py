"""Serialize compile-heavy work against CPU-heavy work on 1-core hosts.

The axon compile helper runs LOCALLY (chipless AOT via libtpu) and has been
SIGKILLed repeatedly when a bench compile shared the single CPU core with a
pytest run (docs/ROUND4_NOTES.md notes 16/19; it can also die uncontended on
~14 MB-MLIR graphs — this lock removes only the contention term). The rule
"nothing CPU-heavy while a bench compile is in flight" lived in a notes file;
this makes it programmatic: ``bench.py`` holds the lock around every
``.lower().compile()`` and ``scripts/run_tests.sh`` holds it around pytest,
so whichever starts second blocks instead of racing.

flock(2) semantics: the lock dies with the holder's fd, so a SIGKILLed
holder never wedges the queue.
"""

from __future__ import annotations

import contextlib
import fcntl
import os
import sys
import time

LOCK_PATH = os.environ.get("PCM_COMPILE_LOCK", "/tmp/pcm_compile.lock")


@contextlib.contextmanager
def compile_lock(note: str = "", path: str | None = None):
    """Exclusive advisory lock shared by bench compiles and test runs.

    Blocks until acquired, printing one stderr line if somebody else holds
    it (so a queued bench run's log explains its silence). Reentrant within
    a process via a module-level depth counter — nested lower/compile pairs
    in one bench invocation take the lock once.
    """
    global _depth
    if _depth > 0:
        _depth += 1
        try:
            yield
        finally:
            _depth -= 1
        return
    p = path or LOCK_PATH
    fd = os.open(p, os.O_CREAT | os.O_RDWR, 0o666)
    try:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            t0 = time.time()
            print(f"# compile_lock: waiting on {p}" + (f" ({note})" if note else ""),
                  file=sys.stderr, flush=True)
            fcntl.flock(fd, fcntl.LOCK_EX)
            print(f"# compile_lock: acquired after {time.time()-t0:.1f}s",
                  file=sys.stderr, flush=True)
        _depth = 1
        try:
            yield
        finally:
            _depth = 0
            fcntl.flock(fd, fcntl.LOCK_UN)
    finally:
        os.close(fd)


_depth = 0
