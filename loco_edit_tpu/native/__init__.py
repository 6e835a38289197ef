"""Native (C++) host-side image pipeline with ctypes bindings.

Builds libimagepipe.so from imagepipe.cpp on first use (g++ -O3, cached next
to the source); falls back to the PIL path in training/data.py when the
toolchain or codecs are unavailable. See imagepipe.cpp for what it implements.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "imagepipe.cpp")
_SO = os.path.join(_DIR, "libimagepipe.so")

_lib = None
_build_error: str | None = None


def _build() -> str | None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return None
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", _SO, "-ljpeg", "-lpng", "-lpthread"]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:  # pragma: no cover
        return str(e)
    return r.stderr if r.returncode else None


def get_lib():
    """The loaded native library, or None (with availability reasons logged)."""
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        return None
    err = _build()
    if err:
        _build_error = err
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:  # pragma: no cover
        _build_error = str(e)
        return None
    lib.ip_decode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.ip_decode.restype = ctypes.c_int
    lib.ip_load_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.ip_load_batch.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def decode_image(path: str, max_side: int = 8192) -> np.ndarray:
    """Decode a JPEG/PNG to uint8 RGB (H, W, 3)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError(f"native pipeline unavailable: {_build_error}")
    buf = np.empty((max_side * max_side * 3,), np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.ip_decode(path.encode(), buf.ctypes.data_as(
        ctypes.POINTER(ctypes.c_uint8)), buf.size, ctypes.byref(w),
        ctypes.byref(h))
    if rc:
        raise IOError(f"decode failed (rc={rc}) for {path}")
    return buf[:h.value * w.value * 3].reshape(h.value, w.value, 3).copy()


def load_batch(paths: list[str], size: int, n_threads: int = 0) -> np.ndarray:
    """Decode+resize+normalize a batch -> (N, size, size, 3) f32 in [-1, 1]."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError(f"native pipeline unavailable: {_build_error}")
    out = np.empty((len(paths), size, size, 3), np.float32)
    joined = b"\0".join(p.encode() for p in paths) + b"\0"
    failed = lib.ip_load_batch(joined, len(paths), size,
                               out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                               n_threads)
    if failed:
        raise IOError(f"{failed}/{len(paths)} images failed to decode")
    return out
