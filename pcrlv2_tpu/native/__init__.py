"""ctypes bindings for the native C++ data plane (``native/pcrl_io.cpp``).

The reference's IO substrate is torch ``DataLoader`` worker processes
(reference ``data.py:95-98``); here a C++ thread pool reads preprocessed
``.npy`` crops straight into one preallocated float32 batch buffer — no GIL
on the IO path, no per-sample allocation.

The shared library is built on demand with ``make -C native`` (g++ is part of
the image); if the build or load fails everything falls back to NumPy, so the
native layer is an accelerator, never a dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libpcrl_io.so")

_lib = None
_lib_lock = threading.Lock()
_load_attempted = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "pcrl_io.cpp")
    if not os.path.exists(src):
        return False
    try:
        # Serialize concurrent first-use builders (luna_preprocess --procs N,
        # or one process per host on a shared FS) with an flock: without it
        # several `make`s compile into the .so in place and a process can
        # dlopen a partially written library.
        import fcntl

        lock_path = os.path.join(_NATIVE_DIR, ".build.lock")
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on any failure."""
    global _lib, _load_attempted
    with _lib_lock:
        if _lib is not None or _load_attempted:
            return _lib
        _load_attempted = True
        # always run make: it is a no-op when the .so is fresh, and rebuilds
        # a stale binary that predates newly added symbols
        if not _build() and not os.path.exists(_SO_PATH):
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
            lib.pcrl_version.restype = ctypes.c_int
            lib.pcrl_read_npy.restype = ctypes.c_int64
            lib.pcrl_read_npy.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64]
            lib.pcrl_read_batch.restype = ctypes.c_int64
            lib.pcrl_read_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int]
            for name, in_t in (("pcrl_resample_i16_to_xyz", ctypes.c_int16),
                               ("pcrl_resample_f32_to_xyz", ctypes.c_float)):
                fn = getattr(lib, name)
                fn.restype = None
                fn.argtypes = [
                    ctypes.POINTER(in_t),
                    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                    ctypes.c_double, ctypes.c_double, ctypes.c_double,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                    ctypes.c_int]
            if lib.pcrl_version() != 1:
                return None
            _lib = lib
        except (OSError, AttributeError):
            # AttributeError: a stale .so missing newly added symbols —
            # fall back to NumPy rather than crash (ctypes raises
            # AttributeError for undefined symbols)
            _lib = None
        return _lib


def available() -> bool:
    return get_lib() is not None


def read_npy(path: str, out: np.ndarray | None = None,
             count: int | None = None) -> np.ndarray:
    """Read one float-convertible ``.npy`` into a flat float32 array."""
    lib = get_lib()
    if lib is None:
        arr = np.load(path).astype(np.float32, copy=False)
        return arr.reshape(-1) if out is None else arr
    if out is None:
        if count is None:
            count = int(os.path.getsize(path) // 4)  # upper bound
        out = np.empty(count, np.float32)
    buf = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    n = lib.pcrl_read_npy(path.encode(), buf, out.size)
    if n < 0:
        raise IOError(f"pcrl_read_npy({path}) failed with code {n}")
    return out[:n]


def read_batch(paths: Sequence[str], out: np.ndarray,
               n_threads: int = 8) -> np.ndarray:
    """Fill ``out`` (n_items, *item_shape) float32 from ``paths`` in parallel.

    Every file must contain exactly ``out[0].size`` elements.  Falls back to
    a NumPy loop when the native library is unavailable.
    """
    assert out.dtype == np.float32 and out.flags.c_contiguous
    n_items = len(paths)
    assert out.shape[0] == n_items
    stride = out[0].size if n_items else 0
    lib = get_lib()
    if lib is None:
        for i, p in enumerate(paths):
            out[i] = np.load(p).astype(np.float32, copy=False).reshape(
                out.shape[1:])
        return out
    arr = (ctypes.c_char_p * n_items)(*[p.encode() for p in paths])
    buf = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    rc = lib.pcrl_read_batch(arr, n_items, buf, stride, n_threads)
    if rc != 0:
        bad = int(-rc) - 1
        raise IOError(f"pcrl_read_batch failed on {paths[bad]}")
    return out


def resample_to_xyz(arr_zyx: np.ndarray, scales_zyx: Sequence[float],
                    out_shape_zyx: Sequence[int],
                    n_threads: int = 0) -> Optional[np.ndarray]:
    """Fused trilinear resample + float32 + (z,y,x)→(x,y,z) transpose — the
    native replacement for the reference's SimpleITK resampler
    (``native/pcrl_resample.cpp``).

    ``scales_zyx[d] = out_spacing/in_spacing`` per axis: output voxel ``i``
    samples input continuous index ``i·scale`` (clamped).  Returns the
    (x, y, z) C-order float32 volume, or None when the native library is
    unavailable (callers fall back to the NumPy path in ``preprocess.mhd``).
    """
    lib = get_lib()
    if lib is None:
        return None
    if arr_zyx.dtype == np.int16:
        fn, ptr_t = lib.pcrl_resample_i16_to_xyz, ctypes.c_int16
    elif arr_zyx.dtype == np.float32:
        fn, ptr_t = lib.pcrl_resample_f32_to_xyz, ctypes.c_float
    else:
        return None
    arr_zyx = np.ascontiguousarray(arr_zyx)
    zi, yi, xi = arr_zyx.shape
    zo, yo, xo = out_shape_zyx
    out = np.empty((xo, yo, zo), np.float32)
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, 16)
    fn(arr_zyx.ctypes.data_as(ctypes.POINTER(ptr_t)), zi, yi, xi,
       float(scales_zyx[0]), float(scales_zyx[1]), float(scales_zyx[2]),
       out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), zo, yo, xo,
       n_threads)
    return out
