"""ctypes binding for the native C++ decode pipeline (io_native.cpp).

The shared library is built lazily on first use with the system g++
(``-O3``, links libpng/libjpeg — both baked into this image). Every call
releases the GIL (ctypes does this for foreign calls), so the plain
thread pool in ``data/loader.py`` gets real decode parallelism — the
native answer to the measured "PIL holds the GIL, threads don't scale"
bound (BENCH_NOTES "host input pipeline").

Set ``UNET_ZOO_NO_NATIVE=1`` to disable (forces the PIL path everywhere).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "io_native.cpp")
_SO = os.path.join(_DIR, "libuzio.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False
_build_error: Optional[str] = None

NATIVE_EXTENSIONS = (".png", ".jpg", ".jpeg")


def _build() -> Optional[str]:
    """Compile io_native.cpp -> libuzio.so. Returns error string or None."""
    cmd = ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-pthread",
           _SRC, "-o", _SO, "-lpng", "-ljpeg"]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=180)
    except (OSError, subprocess.TimeoutExpired) as e:  # no g++ etc.
        return f"{type(e).__name__}: {e}"
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried, _build_error
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("UNET_ZOO_NO_NATIVE"):
            _build_error = "disabled via UNET_ZOO_NO_NATIVE"
            return None
        try:
            stale = (not os.path.exists(_SO)
                     or os.path.getmtime(_SO) < os.path.getmtime(_SRC))
        except OSError:
            stale = True
        if stale:
            _build_error = _build()
            if _build_error is not None:
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            _build_error = str(e)
            return None
        lib.uz_load_image.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.uz_load_image.restype = ctypes.c_int
        lib.uz_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.uz_load_batch.restype = ctypes.c_int
        lib.uz_last_error.restype = ctypes.c_char_p
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native decoder compiled + loaded on this host."""
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def supports(path: str) -> bool:
    return path.lower().endswith(NATIVE_EXTENSIONS)


def load_image(path: str, size: int, channels: int) -> np.ndarray:
    """decode + convert("RGB"|"L") + PIL-BILINEAR resize -> uint8 array.

    channels=3 returns [size, size, 3]; channels=1 returns [size, size].
    Raises RuntimeError on decode failure (caller falls back to PIL).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native decoder unavailable: {_build_error}")
    out = np.empty((size, size, channels) if channels == 3 else (size, size),
                   dtype=np.uint8)
    rc = lib.uz_load_image(
        path.encode(), size, size, channels,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise RuntimeError(lib.uz_last_error().decode(errors="replace"))
    return out


def load_batch(paths: Sequence[str], size: int, channels: int,
               threads: int = 0) -> np.ndarray:
    """Decode a whole batch with an in-library std::thread pool.

    threads=0 auto-selects min(len(paths), cpu_count). Failed items raise.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native decoder unavailable: {_build_error}")
    n = len(paths)
    out = np.empty((n, size, size, channels), dtype=np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if threads <= 0:
        threads = min(n, os.cpu_count() or 1)
    failures = lib.uz_load_batch(
        arr, n, size, size, channels, threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if failures:
        raise RuntimeError(
            f"{failures}/{n} decode failures; first: "
            f"{lib.uz_last_error().decode(errors='replace')}")
    return out if channels == 3 else out[..., 0]
