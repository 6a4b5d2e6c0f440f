"""Native (C++) host-runtime kernels, loaded via ctypes.

Provides fast sparse-COO ingestion (:func:`coalesce_flat`,
:func:`extract_nonzeros`) backed by ``coalesce.cpp``.  The shared library is
looked up next to this file, else built on first use with ``g++`` into a
user cache directory; callers must handle :data:`available` being False
(numpy fallbacks live in :mod:`pytorch_nmf_tpu.ops.sparse`).
"""

import ctypes
import os
import subprocess
import tempfile

import numpy as np

__all__ = ["available", "coalesce_flat", "extract_nonzeros"]

_LIB = None
_SRC = os.path.join(os.path.dirname(__file__), "coalesce.cpp")
_SONAME = "libpnt_native.so"


def _candidate_paths():
    yield os.path.join(os.path.dirname(__file__), _SONAME)
    cache = os.environ.get(
        "PNT_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "pnt_native_cache"),
    )
    yield os.path.join(cache, _SONAME)


def _build(dest: str) -> bool:
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    # compile to a per-process temp name and os.replace (atomic on the
    # same filesystem): concurrent first-use from two processes must
    # never load or overwrite a partially written .so
    tmp = f"{dest}.tmp.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        _SRC, "-o", tmp,
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        os.replace(tmp, dest)
        return True
    except Exception:
        try:
            os.remove(tmp)
        except OSError:
            pass
        return False


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    for path in _candidate_paths():
        if not os.path.exists(path):
            continue
        try:
            _LIB = _bind(ctypes.CDLL(path))
            return _LIB
        except (OSError, AttributeError):  # missing/stale lib or symbol
            continue
    # build into the cache location
    for path in list(_candidate_paths())[1:]:
        if _build(path):
            try:
                _LIB = _bind(ctypes.CDLL(path))
                return _LIB
            except (OSError, AttributeError):
                pass
    _LIB = False
    return _LIB


def _bind(lib):
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.pnt_coalesce_f32.restype = ctypes.c_int64
    lib.pnt_coalesce_f32.argtypes = [i64p, f32p, ctypes.c_int64, i64p, f32p]
    lib.pnt_extract_f32.restype = ctypes.c_int64
    lib.pnt_extract_f32.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_float, i64p, f32p,
    ]
    return lib


def available() -> bool:
    return bool(_load())


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def coalesce_flat(flat: np.ndarray, vals: np.ndarray):
    """Sort flattened COO keys and sum duplicates.

    Returns ``(flat_sorted_unique, summed_vals)`` or ``None`` when the
    native library is unavailable.
    """
    lib = _load()
    if not lib:
        return None
    flat = np.ascontiguousarray(flat, dtype=np.int64)
    vals = np.ascontiguousarray(vals, dtype=np.float32)
    nnz = flat.shape[0]
    out_flat = np.empty(nnz, np.int64)
    out_vals = np.empty(nnz, np.float32)
    n = lib.pnt_coalesce_f32(
        _i64p(flat), _f32p(vals), nnz, _i64p(out_flat), _f32p(out_vals)
    )
    return out_flat[:n], out_vals[:n]


def extract_nonzeros(dense: np.ndarray, threshold: float = 0.0):
    """Flattened indices/values of entries strictly above ``threshold``,
    or ``None`` when the native library is unavailable."""
    lib = _load()
    if not lib:
        return None
    dense = np.ascontiguousarray(dense, dtype=np.float32)
    size = dense.size
    out_flat = np.empty(size, np.int64)
    out_vals = np.empty(size, np.float32)
    n = lib.pnt_extract_f32(
        _f32p(dense.reshape(-1)), size, threshold, _i64p(out_flat),
        _f32p(out_vals),
    )
    return out_flat[:n], out_vals[:n]
