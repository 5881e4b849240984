"""ctypes bindings for the native NRRD decoder / raw-cache loader.

The C++ library (rpnet_tpu/native/nrrd_cache.cpp) inflates gzip NRRD payloads
straight into numpy buffers and converts volumes to a flat ``.rawcache``
format whose loads are a single pread — the IO fast path for episodic eval
(the reference re-reads gzip NRRDs through pynrrd on every episode).

Builds the shared library on first use (g++ available in the image); every
entry point falls back to the pure-Python codec (core/nrrd_io.py) if the
native library is unavailable, so nothing hard-depends on it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from rpnet_tpu.core import nrrd_io

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libnrrdcache.so")

_DTYPE_CODES = {1: np.int8, 2: np.uint8, 3: np.int16, 4: np.uint16,
                5: np.int32, 6: np.uint32, 7: np.int64, 8: np.uint64,
                9: np.float32, 10: np.float64}

_lib = None
_lib_failed = False


def _load_library():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.nrrd_query.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_uint32),
                                   ctypes.POINTER(ctypes.c_uint32),
                                   ctypes.POINTER(ctypes.c_uint64)]
        lib.nrrd_read_into.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                       ctypes.c_uint64]
        lib.nrrd_to_rawcache.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.rawcache_query.argtypes = lib.nrrd_query.argtypes
        lib.rawcache_read_into.argtypes = lib.nrrd_read_into.argtypes
        _lib = lib
    except Exception:
        _lib_failed = True
    return _lib


def native_available() -> bool:
    return _load_library() is not None


def _query(lib, fn, path: str) -> Optional[Tuple[np.dtype, Tuple[int, ...]]]:
    dtype_code = ctypes.c_uint32(0)
    ndim = ctypes.c_uint32(0)
    sizes = (ctypes.c_uint64 * 16)()
    if fn(path.encode(), ctypes.byref(dtype_code), ctypes.byref(ndim), sizes) != 0:
        return None
    shape = tuple(int(sizes[i]) for i in range(ndim.value))
    return np.dtype(_DTYPE_CODES[dtype_code.value]), shape


def _to_index_order(flat: np.ndarray, shape) -> np.ndarray:
    """NRRD element order (first axis fastest) → shape == sizes array."""
    arr = flat.reshape(shape[::-1]).transpose(tuple(range(len(shape) - 1, -1, -1)))
    return np.ascontiguousarray(arr)


def read(path: str) -> Tuple[np.ndarray, dict]:
    """Drop-in for nrrd_io.read using the native decoder when available."""
    lib = _load_library()
    if lib is None:
        return nrrd_io.read(path)
    meta = _query(lib, lib.nrrd_query, path)
    if meta is None:
        return nrrd_io.read(path)
    dtype, shape = meta
    buf = np.empty(int(np.prod(shape)), dtype=dtype)
    rc = lib.nrrd_read_into(path.encode(), buf.ctypes.data_as(ctypes.c_void_p),
                            ctypes.c_uint64(buf.nbytes))
    if rc != 0:
        return nrrd_io.read(path)
    return _to_index_order(buf, shape), {"native": True}


def cache_path_for(nrrd_path: str, cache_dir: Optional[str] = None) -> str:
    base = os.path.basename(nrrd_path) + ".rawcache"
    return os.path.join(cache_dir or os.path.dirname(nrrd_path), base)


def read_cached(nrrd_path: str, cache_dir: Optional[str] = None):
    """Read through the raw cache: convert once, then single-pread loads."""
    lib = _load_library()
    if lib is None:
        return nrrd_io.read(nrrd_path)
    cpath = cache_path_for(nrrd_path, cache_dir)
    if not os.path.exists(cpath) or \
            os.path.getmtime(cpath) < os.path.getmtime(nrrd_path):
        if lib.nrrd_to_rawcache(nrrd_path.encode(), cpath.encode()) != 0:
            return read(nrrd_path)
    meta = _query(lib, lib.rawcache_query, cpath)
    if meta is None:
        return read(nrrd_path)
    dtype, shape = meta
    buf = np.empty(int(np.prod(shape)), dtype=dtype)
    rc = lib.rawcache_read_into(cpath.encode(),
                                buf.ctypes.data_as(ctypes.c_void_p),
                                ctypes.c_uint64(buf.nbytes))
    if rc != 0:
        return read(nrrd_path)
    return _to_index_order(buf, shape), {"native": True, "cached": True}
