"""ctypes bindings for the native .npz loader (native/npz_loader.cc).

The reference's input pipeline stalled on Python-side .npz inflate
(SURVEY.md §3.1); this loads fields through a C++ reader (zip walk + raw
zlib inflate + npy parse, GIL-free, with an in-library thread pool for
batches).  Falls back to numpy transparently: `load_npz_field` /
`load_npz_batch` keep working when the shared library isn't built.

Build on first use: ``make -C native`` (g++ + zlib, both in the image);
the resulting ``libnpz.so`` is cached beside the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libnpz.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib():
    """The loaded shared library, building it on first use; None if
    unavailable (callers fall back to numpy)."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        # Always run make: a no-op when libnpz.so is newer than the
        # source, but rebuilds after npz_loader.cc changes (a stale .so
        # would otherwise be used silently forever).  The Makefile links
        # to a temp name and mv's it into place, so a concurrent process
        # never dlopens a half-written library.
        if not _build():
            if not os.path.exists(_LIB_PATH):
                _build_failed = True
                return None
            # A prebuilt library exists but the rebuild failed (toolchain
            # absent?).  It may be stale relative to npz_loader.cc — say
            # so instead of silently dlopening it.
            import warnings

            warnings.warn(
                f"make -C {_NATIVE_DIR} failed; using possibly-stale "
                f"prebuilt {_LIB_PATH}", RuntimeWarning, stacklevel=2)
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.df_npz_read.restype = ctypes.c_int
            lib.df_npz_read.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
            ]
            lib.df_npz_read_batch.restype = ctypes.c_int
            lib.df_npz_read_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ]
            _lib = lib
        except OSError:
            _build_failed = True
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def load_npz_field(path: str, key: str = "x",
                   capacity: int = 1 << 24) -> np.ndarray:
    """Read one array from an .npz as float32 (native, numpy fallback)."""
    lib = get_lib()
    if lib is None:
        with np.load(path) as d:
            return d[key].astype(np.float32)
    out = np.empty(capacity, np.float32)
    shape = (ctypes.c_int64 * 8)()
    ndim = ctypes.c_int()
    rc = lib.df_npz_read(
        path.encode(), key.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        capacity, shape, ctypes.byref(ndim))
    if rc != 0:  # unsupported entry (e.g. 0-d or big-endian) -> fallback
        with np.load(path) as d:
            return d[key].astype(np.float32)
    dims = tuple(shape[i] for i in range(ndim.value))
    n = int(np.prod(dims)) if dims else 1
    return out[:n].reshape(dims).copy()


def load_npz_batch(paths: list[str], key: str, item_shape: tuple[int, ...],
                   num_threads: int = 8) -> np.ndarray:
    """Read many same-shape arrays into one [N, *item_shape] f32 block.

    Uses the in-library thread pool (zero Python overhead per file); falls
    back to a numpy loop when the native library is unavailable.
    """
    n = len(paths)
    stride = int(np.prod(item_shape))
    if n == 0:  # the C path returns early without filling shape/ndim
        return np.empty((0,) + tuple(item_shape), np.float32)
    lib = get_lib()
    if lib is None:
        out = np.empty((n,) + tuple(item_shape), np.float32)
        for i, p in enumerate(paths):
            with np.load(p) as d:
                out[i] = d[key].astype(np.float32)
        return out
    out = np.empty((n, stride), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    shape = (ctypes.c_int64 * 8)()
    ndim = ctypes.c_int()
    rc = lib.df_npz_read_batch(
        arr, n, key.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        stride, shape, ctypes.byref(ndim), num_threads)
    if rc != 0:
        out2 = np.empty((n,) + tuple(item_shape), np.float32)
        for i, p in enumerate(paths):
            with np.load(p) as d:
                out2[i] = d[key].astype(np.float32)
        return out2
    got = tuple(shape[i] for i in range(ndim.value))
    if int(np.prod(got)) != stride:
        raise ValueError(f"batch shape {got} != expected {item_shape}")
    return out.reshape((n,) + tuple(item_shape))
