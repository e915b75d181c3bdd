"""ctypes bindings for the native IO runtime (``native/dbsr_io.cpp``).

Builds the shared library on first use (g++ + zlib, both baked into the
image) and exposes:

  * ``read_png(path)`` — fast PNG decode (8/16-bit, 1-4 channels),
  * ``read_jpeg(path)`` — libjpeg-turbo RGB decode (the fast path for the
    46k Zurich JPEGs; reference counterpart: jpeg4py loader
    ``data/image_loader.py:5-61``),
  * ``load_burst(paths)`` — threaded concurrent decode of a burst's frames
    into one contiguous array.

Falls back to the pure-Python codec (``dbsr_tpu/utils/png16.py``) when the
toolchain is unavailable, so the framework stays importable everywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdbsr_io.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "dbsr_io.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-fPIC", "-shared",
             "-o", _LIB_PATH, src, "-lz", "-ljpeg", "-lpthread"],
            check=True, capture_output=True, cwd=_NATIVE_DIR)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        if not hasattr(lib, "dbsr_jpeg_decode"):
            # stale pre-JPEG build on disk: rebuild and reload
            if not _build():
                return None
            lib = ctypes.CDLL(_LIB_PATH)
        lib.dbsr_png_info.restype = ctypes.c_int
        lib.dbsr_png_info.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.dbsr_png_decode.restype = ctypes.c_int
        lib.dbsr_png_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p]
        lib.dbsr_load_burst.restype = ctypes.c_int
        lib.dbsr_load_burst.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_void_p,
            ctypes.c_size_t, ctypes.c_int]
        lib.dbsr_jpeg_info.restype = ctypes.c_int
        lib.dbsr_jpeg_info.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.dbsr_jpeg_decode.restype = ctypes.c_int
        lib.dbsr_jpeg_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p]
        lib.dbsr_load_jpeg_batch.restype = ctypes.c_int
        lib.dbsr_load_jpeg_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_void_p,
            ctypes.c_size_t, ctypes.c_int]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def read_png(path: str) -> np.ndarray:
    """Decode a PNG to ``[H, W, C]`` uint8/uint16 (native fast path with
    pure-Python fallback)."""
    lib = get_lib()
    if lib is None:
        from dbsr_tpu.utils.png16 import read_png as py_read
        return py_read(path)

    with open(path, "rb") as f:
        buf = f.read()
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    d = ctypes.c_int()
    rc = lib.dbsr_png_info(buf, len(buf), ctypes.byref(w), ctypes.byref(h),
                           ctypes.byref(c), ctypes.byref(d))
    if rc != 0:
        raise ValueError(f"{path}: bad PNG (rc={rc})")
    dtype = np.uint16 if d.value == 16 else np.uint8
    out = np.empty((h.value, w.value, c.value), dtype)
    rc = lib.dbsr_png_decode(buf, len(buf),
                             out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise ValueError(f"{path}: PNG decode failed (rc={rc})")
    return out


def load_burst(paths: List[str], num_threads: int = 0) -> np.ndarray:
    """Concurrently decode ``paths`` (same shape/dtype) into
    ``[N, H, W, C]``. Falls back to sequential reads without the native
    lib."""
    lib = get_lib()
    if lib is None:
        return np.stack([read_png(p) for p in paths])

    first = read_png(paths[0])
    out = np.empty((len(paths),) + first.shape, first.dtype)
    out[0] = first
    if len(paths) == 1:
        return out
    arr = (ctypes.c_char_p * len(paths))(
        *[p.encode() for p in paths])
    rc = lib.dbsr_load_burst(arr, len(paths),
                             out.ctypes.data_as(ctypes.c_void_p),
                             first.nbytes, num_threads)
    if rc != 0:
        raise ValueError(f"burst load failed (rc={rc}, "
                         f"file index {-rc - 100})")
    return out


def read_jpeg(path: str) -> np.ndarray:
    """Decode a JPEG to ``[H, W, 3]`` uint8 RGB via libjpeg-turbo, falling
    back to PIL (bit-exact with the native path — both are libjpeg)."""
    lib = get_lib()
    if lib is None:
        from PIL import Image
        return np.asarray(Image.open(path).convert("RGB"))

    with open(path, "rb") as f:
        buf = f.read()
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.dbsr_jpeg_info(buf, len(buf), ctypes.byref(w), ctypes.byref(h),
                            ctypes.byref(c))
    if rc != 0:
        raise ValueError(f"{path}: bad JPEG (rc={rc})")
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.dbsr_jpeg_decode(buf, len(buf),
                              out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise ValueError(f"{path}: JPEG decode failed (rc={rc})")
    return out


def load_jpeg_batch(paths: List[str], num_threads: int = 0) -> np.ndarray:
    """Concurrently decode same-sized JPEGs into ``[N, H, W, 3]`` uint8."""
    lib = get_lib()
    if lib is None:
        return np.stack([read_jpeg(p) for p in paths])

    first = read_jpeg(paths[0])
    out = np.empty((len(paths),) + first.shape, np.uint8)
    out[0] = first
    if len(paths) == 1:
        return out
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    rc = lib.dbsr_load_jpeg_batch(arr, len(paths),
                                  out.ctypes.data_as(ctypes.c_void_p),
                                  first.nbytes, num_threads)
    if rc != 0:
        raise ValueError(f"jpeg batch load failed (rc={rc}, "
                         f"file index {-rc - 100})")
    return out
