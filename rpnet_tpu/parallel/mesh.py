"""Device mesh + sharding rules — the comm layer the reference never had.

The reference's only parallelism is single-process ``data_parallel``
scatter/gather (SURVEY.md §2.2). Here scaling is a first-class
``jax.sharding.Mesh`` with two axes:

  * ``data``  — episodes (training) / query slices (eval). Sharding the
    z-slice axis of a volume across chips is this workload's analogue of
    sequence parallelism (SURVEY.md §5): each chip registers+encodes its
    slice shard; the only cross-chip traffic is the Dice/NCC reductions
    (psum over ICI, inserted by GSPMD).
  * ``model`` — optional tensor-parallel axis: output channels of the widest
    conv kernels are sharded; GSPMD inserts the all-gathers. At this model
    scale (≤30M params) it exists to prove the mechanism, not for memory.

Multi-host: ``jax.distributed.initialize`` before ``make_mesh`` and the same
code runs over DCN+ICI.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed(config=None) -> bool:
    """Initialize JAX's multi-host runtime when launched as one process of a
    pod (SURVEY §5 comm backend). Triggered by ``multihost: true`` in the
    YAML or a ``JAX_COORDINATOR_ADDRESS`` env var; both are no-ops when the
    runtime is already initialized or the process runs alone.

    On TPU pods ``jax.distributed.initialize()`` auto-discovers coordinator/
    process_id from the environment; elsewhere pass ``coordinator_address``/
    ``num_processes``/``process_id`` YAML keys. Returns True if initialized.
    """
    import os

    want = bool((config or {}).get("multihost")) if config is not None else False
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not (want or addr):
        return False
    # NB: must not touch jax.process_count()/jax.devices() here — any such
    # call initializes the XLA backend, after which distributed.initialize
    # permanently fails ("must be called before any JAX calls")
    if jax.distributed.is_initialized():
        return True   # already up
    kwargs = {}
    if config is not None:
        for yaml_key, kw in (("coordinator_address", "coordinator_address"),
                             ("num_processes", "num_processes"),
                             ("process_id", "process_id")):
            if config.get(yaml_key) is not None:
                kwargs[kw] = config[yaml_key]
    if addr and "coordinator_address" not in kwargs:
        kwargs["coordinator_address"] = addr
    try:
        jax.distributed.initialize(**kwargs)
        return True
    except Exception as e:
        # an EXPLICIT multihost request that fails must be fatal — N hosts
        # silently degrading into N independent single-process runs train
        # divergent models into the same out_dir. RPNET_MULTIHOST_OPTIONAL=1
        # restores the old degrade-and-continue behavior (single-machine
        # experiments with a stale env var).
        optional = os.environ.get("RPNET_MULTIHOST_OPTIONAL", "").lower()
        if optional not in ("", "0", "false", "no"):
            print(f"[multihost init skipped: {e}]")
            return False
        raise RuntimeError(
            f"multihost init requested ({'multihost: true' if want else 'JAX_COORDINATOR_ADDRESS'}) "
            f"but jax.distributed.initialize failed: {e}") from e


def allgather_merge_records(arrays, failures: int = 0):
    """Merge per-episode record arrays + a failure count across processes.

    The eval drivers shard episodes/volumes by a strided index; each process
    fills only its own slots (int32 arrays hold -1 elsewhere, float arrays
    NaN). ``process_allgather`` + element-wise max / nanmax recovers the full
    record on EVERY process; failures sum globally. Single-process calls
    return the inputs unchanged.
    """
    import numpy as np

    if jax.process_count() <= 1:
        return list(arrays), failures
    from jax.experimental import multihost_utils

    def merge(a):
        g = np.asarray(multihost_utils.process_allgather(a))   # (P, ...)
        if np.issubdtype(a.dtype, np.integer):
            return g.max(axis=0)          # -1 everywhere except the owner
        with np.errstate(all="ignore"):
            return np.nanmax(g, axis=0)   # exactly one non-NaN per slot
    merged = [merge(a) for a in arrays]
    total_failures = int(np.sum(np.asarray(
        multihost_utils.process_allgather(np.asarray(failures)))))
    return merged, total_failures


def make_mesh(shape: Optional[Dict[str, int]] = None, devices=None) -> Mesh:
    """Build a mesh. Default: all devices on the ``data`` axis."""
    devices = devices if devices is not None else jax.devices()
    if not shape:
        shape = {"data": len(devices), "model": 1}
    if "model" not in shape:
        shape = dict(shape, model=1)
    total = int(np.prod(list(shape.values())))
    if total != len(devices):
        raise ValueError(f"mesh shape {shape} needs {total} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices).reshape([shape[a] for a in ("data", "model")])
    return Mesh(arr, axis_names=("data", "model"))


def resolve_local_mesh(mesh_shape: Optional[Dict[str, int]], devices=None,
                       batch_divisor: Optional[int] = None,
                       label: str = "mesh") -> Mesh:
    """Build the per-process mesh every data-sharded DRIVER uses.

    Drivers (RP_Net eval, LGCA train/eval) shard a batch axis over ``data``
    on THIS process's local devices; episodes/volumes shard across processes
    separately. This helper centralizes the two policies the call sites were
    each reimplementing:

    * ``mesh_shape`` sized for the GLOBAL device count on a multi-process pod
      (the natural way to write the YAML) is reinterpreted per-process — the
      data axis divides by ``jax.process_count()`` when that lands on the
      local device count; anything else is a clear error.
    * ``batch_divisor`` (e.g. the LGCA slice batch) constrains the data axis:
      the AUTO mesh picks the largest divisor of it that fits the device
      count (a 4-slice batch on 8 chips runs dp=4, not a shape error); an
      EXPLICIT shape that cannot divide the batch raises.
    """
    local = list(devices) if devices is not None else jax.local_devices()
    shape = dict(mesh_shape) if mesh_shape else None
    if shape is not None:
        pcount = jax.process_count()
        if pcount > 1:
            total = int(np.prod(list(shape.values())))
            data = int(shape.get("data", 1))
            if (total != len(local) and data % pcount == 0
                    and total // pcount == len(local)):
                shape["data"] = data // pcount
                print(f"[{label}_shape data axis {data} split over {pcount} "
                      f"processes → {shape['data']} local]")
            elif total != len(local):
                raise ValueError(
                    f"mesh_shape {dict(mesh_shape)} needs {total} devices but "
                    f"meshes span only this process's {len(local)} local "
                    f"devices (work shards across processes); use a "
                    f"per-process shape or a data axis divisible by "
                    f"process_count={pcount}")
        if (batch_divisor is not None
                and batch_divisor % int(shape.get("data", 1)) != 0):
            raise ValueError(
                f"mesh_shape data axis {shape.get('data')} must divide the "
                f"sharded batch size {batch_divisor}")
        # an explicit shape SMALLER than the host's device count is a valid
        # ask (e.g. {data: 1} for bit-reproducible single-device eval that
        # matches a serving artifact) — use the first `total` local devices
        total = int(np.prod(list(shape.values())))
        if total < len(local):
            local = local[:total]
        return make_mesh(shape, devices=local)
    if batch_divisor is not None:
        data = max(d for d in range(1, len(local) + 1)
                   if batch_divisor % d == 0)
        return make_mesh({"data": data, "model": 1}, devices=local[:data])
    return make_mesh(None, devices=local)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_slices(mesh: Mesh, ndim: int, slice_axis: int = 0) -> NamedSharding:
    """Shard a given axis over ``data``; other axes replicated."""
    spec = [None] * ndim
    spec[slice_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def param_sharding_rule(path: Sequence, leaf, mesh: Mesh,
                        min_channels: int = 256) -> NamedSharding:
    """Tensor-parallel rule: shard conv-kernel output channels ≥min_channels
    over ``model``; everything else replicated.

    Conv kernels are HWIO — output channels last. BatchNorm/bias vectors stay
    replicated (they're tiny and feed elementwise ops).
    """
    if mesh.shape.get("model", 1) == 1:
        return replicated(mesh)
    shape = getattr(leaf, "shape", ())
    names = [getattr(p, "key", str(p)) for p in path]
    is_kernel = names and names[-1] == "kernel"
    if is_kernel and len(shape) == 4 and shape[-1] >= min_channels \
            and shape[-1] % mesh.shape["model"] == 0:
        return NamedSharding(mesh, P(None, None, None, "model"))
    return replicated(mesh)


def shard_params(variables, mesh: Mesh, min_channels: int = 256):
    """Apply the TP rule to a variable pytree → tree of NamedShardings."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: param_sharding_rule(path, leaf, mesh, min_channels),
        variables)


def device_put_sharded_tree(tree, shardings):
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
