"""ctypes binding for the native image pipeline (native/image_pipe.cpp).

``load_resized(path, res)`` decodes a JPEG/PNG/WebP file and returns an RGB
uint8 array with the shortest side Lanczos3-resized to ``res`` — the decode+
resize hot path of ``ImageFolderDataset`` (reference equivalent:
PIL open/convert/resize in ``train_pcm_lora_sd15.py:75-117``). The C call
releases the GIL, so the loader's thread pool parallelizes fully, and JPEGs
are DCT-prescaled in-decoder before the Lanczos pass.

Falls back cleanly: ``available()`` is False when no toolchain/library is
present; per-file failures (exotic formats, CMYK JPEGs) raise ValueError so
the dataset can retry via its PIL path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libimage_pipe.so")
_lock = threading.Lock()
_lib = None
_load_failed = False

NATIVE_EXTS = (".jpg", ".jpeg", ".png", ".webp")


def _get_lib():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "libimage_pipe.so"],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.ip_load_resized.argtypes = [
                ctypes.c_char_p, ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.ip_load_resized.restype = ctypes.c_int
            lib.ip_free.argtypes = [ctypes.POINTER(ctypes.c_ubyte)]
            lib.ip_free.restype = None
            _lib = lib
        except Exception:
            _load_failed = True
    return _lib


def available() -> bool:
    return _get_lib() is not None


def load_resized(path: str, res: int) -> np.ndarray:
    """Decode + shortest-side Lanczos3 resize to ``res``; (H, W, 3) uint8."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native image pipeline unavailable")
    buf = ctypes.POINTER(ctypes.c_ubyte)()
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.ip_load_resized(
        path.encode(), int(res), ctypes.byref(buf),
        ctypes.byref(w), ctypes.byref(h),
    )
    if rc != 0:
        raise ValueError(f"ip_load_resized({path!r}) failed rc={rc}")
    try:
        n = h.value * w.value * 3
        arr = np.ctypeslib.as_array(buf, shape=(n,)).reshape(h.value, w.value, 3)
        return arr.copy()
    finally:
        lib.ip_free(buf)
