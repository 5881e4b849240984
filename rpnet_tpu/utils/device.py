"""Device helpers."""

from __future__ import annotations

import os


def maybe_enable_compilation_cache(config=None):
    """Persistent XLA compilation cache (YAML ``compilation_cache_dir``;
    default ``~/.cache/rpnet_tpu/xla``; ``false``/empty disables).

    First compiles of the fused episode/training programs take 20-120 s on a
    tunneled TPU; with the cache, repeated CLI runs with unchanged shapes
    load the executable in ~1 s. Safe to call multiple times.
    """
    import jax

    path = None
    if config is not None:
        path = config.get("compilation_cache_dir", None)
    if path is None:
        path = os.path.join(os.path.expanduser("~"), ".cache", "rpnet_tpu", "xla")
    if not path:            # explicit falsy value disables
        return None
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every compile, even fast ones (default threshold is 1s)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        return path
    except Exception:       # pragma: no cover — cache is best-effort
        return None


def aot_compile_step(step_fn, state, batch_shapes, batch_dtypes=None):
    """AOT-compile a train step: ``jax.jit(fn).lower(...).compile()``.

    Why not plain ``jax.jit``: on TPU the jit cache keys on input *layouts*.
    Host-initialized params carry default layouts; the step's OUTPUT params
    carry XLA-chosen (tiled) layouts — so the SECOND call re-keys and
    recompiles the entire training program (~2 min at 256²; measured 136s).
    The AOT-compiled executable is invoked directly, bypassing the cache:
    one compile total, step 1 runs at steady-state speed.

    ``batch_shapes``: tuple of array shapes for the (supp_img, supp_lab,
    qry_img, qry_lab) batch; lowering uses f32 ShapeDtypeStructs unless
    ``batch_dtypes`` overrides per position (the train CLI lowers labels as
    uint8 — compact transfer, widened on device by the step itself).
    """
    import jax
    import numpy as np

    if batch_dtypes is None:
        batch_dtypes = (np.float32,) * len(batch_shapes)
    abstract = tuple(jax.ShapeDtypeStruct(s, d)
                     for s, d in zip(batch_shapes, batch_dtypes))
    return jax.jit(step_fn).lower(state, abstract).compile()


def init_on_host_cpu(model, rng, dummy, train: bool = False):
    """Initialize flax params on the host CPU backend, then move them to the
    default device.

    On tunneled TPU backends, compiling the init program remotely takes
    minutes; tracing it on the CPU takes seconds and the parameters are
    identical. The correlation impl is pinned to XLA during the trace (the
    Pallas kernel can't run on CPU and parameters don't depend on it).

    ``rng``/``dummy`` are re-committed to the CPU device first: jit follows
    committed ARGUMENT placement over ``default_device``, so a PRNGKey or
    dummy array created on the TPU would silently drag the whole init back
    through the tunnel — measured 285 s of eager remote dispatches in the
    eval CLI (852 ops × ~0.3 s) before this re-commit existed.
    """
    import jax

    # LOCAL devices only: in a multi-process pod jax.devices() is the global
    # list and index 0 belongs to process 0 — an eager op committed to a
    # non-addressable device segfaults inside threefry on every other process
    dev = jax.local_devices()[0]
    prev = os.environ.get("RPNET_CORR_IMPL")   # restore, don't clobber
    try:
        os.environ["RPNET_CORR_IMPL"] = "xla"
        cpu = jax.local_devices(backend="cpu")[0]
        rng = jax.device_put(rng, cpu)
        dummy = jax.tree_util.tree_map(lambda a: jax.device_put(a, cpu), dummy)
        with jax.default_device(cpu):
            variables = model.init(rng, *dummy, train=train)
        if dev.platform != "cpu":
            variables = jax.device_put(variables, dev)
        return variables
    except RuntimeError:
        return model.init(rng, *dummy, train=train)
    finally:
        if prev is None:
            os.environ.pop("RPNET_CORR_IMPL", None)
        else:
            os.environ["RPNET_CORR_IMPL"] = prev
