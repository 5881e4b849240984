"""Native NRRD decoder / raw-cache tests (C++ via ctypes, fallback-safe)."""

import os

import numpy as np
import pytest

from rpnet_tpu.core import native_cache, nrrd_io


@pytest.fixture(scope="module")
def volumes(tmp_path_factory):
    root = tmp_path_factory.mktemp("nat")
    rng = np.random.RandomState(0)
    paths = {}
    for name, dtype, enc in [("a", np.int16, "gzip"), ("b", np.float32, "gzip"),
                             ("c", np.uint8, "raw")]:
        vol = (rng.rand(7, 9, 11) * 100).astype(dtype)
        p = str(root / f"{name}.nrrd")
        nrrd_io.write(p, vol, encoding=enc)
        paths[name] = (p, vol)
    return paths


def test_native_builds_and_reads(volumes):
    assert native_cache.native_available(), "native build failed (g++/zlib)"
    for p, vol in volumes.values():
        arr, meta = native_cache.read(p)
        assert meta.get("native")
        np.testing.assert_array_equal(arr, vol)


def test_rawcache_roundtrip(volumes, tmp_path):
    p, vol = volumes["a"]
    arr, meta = native_cache.read_cached(p, cache_dir=str(tmp_path))
    assert meta.get("cached")
    np.testing.assert_array_equal(arr, vol)
    # second read comes from the cache file
    cpath = native_cache.cache_path_for(p, str(tmp_path))
    assert os.path.exists(cpath)
    arr2, _ = native_cache.read_cached(p, cache_dir=str(tmp_path))
    np.testing.assert_array_equal(arr2, vol)


def test_fallback_on_alien_file(tmp_path):
    bad = str(tmp_path / "bad.nrrd")
    open(bad, "wb").write(b"JUNK")
    with pytest.raises(ValueError):
        native_cache.read(bad)   # falls back to python codec, which raises
