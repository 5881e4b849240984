"""Test harness: run everything on a virtual 8-device CPU mesh.

Mirrors the fake-device strategy from SURVEY.md §4: tests never need real TPU
hardware; multi-chip sharding is exercised via
``--xla_force_host_platform_device_count=8``.

Env vars must be set before jax initializes, hence the top-of-file placement.
"""

import os
import sys

# NOTE: this image exports JAX_PLATFORMS=axon and the axon plugin re-writes
# jax_platforms at import, so the env var alone does NOT select the CPU — the
# config must be updated after import (see below).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Parity tests against torch float32 oracles need real float32 accumulation
# even if a TPU-ish backend sneaks in.
jax.config.update("jax_default_matmul_precision", "float32")
# Persistent compilation cache: keeps the repeated tiny test compiles cheap.
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
