"""LGCANet_V3 training/eval driver — makes `net: LGCANet_V3` actually
runnable (the reference registers it in model_factory, net/model.py:4-7, but
test_rpnet.py's episodic loop feeds the RP_Net signature and no reader
produces the LGCA contract; here the model gets its own step + eval built on
episode/lgca_data.py).

One jitted train step: 3D context net over the downsampled volume + 2D
fused U-Net over a slice batch, per-class 2D+3D dice loss
(lgca_net_v3.py:629-649), Adam update.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rpnet_tpu.models.lgca import LGCANetV3


def make_lgca_train_step(model: LGCANetV3, config, optimizer):
    def loss_fn(params, batch_stats, volume, slices, mask, vmask):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            volume, slices, train=True, mutable=["batch_stats"])
        losses = LGCANetV3.loss(out, {"mask": mask,
                                      "downsampled_volume_mask": vmask})
        loss = jnp.mean(losses["loss_dice"])
        metrics = {"unet_dice": jnp.mean(losses["unet_dice"])}
        return loss, (metrics, mutated["batch_stats"])

    def train_step(state: Dict, batch: Tuple):
        volume, slices, mask, vmask = batch
        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"], state["batch_stats"],
                                   volume, slices, mask, vmask)
        updates, opt_state = optimizer.update(grads, state["opt_state"],
                                              state["params"])
        params = optax.apply_updates(state["params"], updates)
        return ({"step": state["step"] + 1, "params": params,
                 "batch_stats": new_stats, "opt_state": opt_state},
                dict(metrics, loss=loss))

    return train_step


def sharded_lgca_train_step(model: LGCANetV3, config, optimizer, mesh):
    """jit the LGCA step over a mesh: the slice batch (and its mask) shard on
    the ``data`` axis, the 3D context volume and params replicate.

    The reference's LGCANet_V3 is DEFINED around torch data_parallel — it
    scatters the slice batch over GPUs and replicates the context features by
    ``cuda.device_count()`` (lgca_net_v3.py:600,615,622). Here GSPMD gets the
    same layout from sharding annotations, and unlike torch data_parallel the
    BN batch statistics stay GLOBAL over the slice batch — the sharded step
    is numerically the single-device step (tests/test_lgca.py asserts it).
    """
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    step = make_lgca_train_step(model, config, optimizer)
    repl = NamedSharding(mesh, P())

    def batch_sharding(volume, slices, mask, vmask):
        on_data = lambda x: jax.device_put(
            x, NamedSharding(mesh, P(*(["data"] + [None] * (x.ndim - 1)))))
        return (jax.device_put(volume, repl), on_data(slices),
                on_data(mask), jax.device_put(vmask, repl))

    jitted = jax.jit(step, donate_argnums=(0,))

    def run(state, batch):
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), state)
        return jitted(state, batch_sharding(*map(jnp.asarray, batch)))

    return run


def init_lgca_state(model: LGCANetV3, config, rng, sampler, optimizer=None):
    """Initialize on host CPU with the sampler's static shapes."""
    from rpnet_tpu.train.trainer import make_optimizer
    from rpnet_tpu.utils.device import init_on_host_cpu

    D, H, W = sampler.shape
    sz, sy, sx = sampler.ds
    B = sampler.slices_per_step
    dummy = (jnp.zeros((1, D // sz, H // sy, W // sx, 1), jnp.float32),
             jnp.zeros((B, H, W, 1), jnp.float32))
    variables = init_on_host_cpu(model, rng, dummy)
    if optimizer is None:
        optimizer = make_optimizer(config)
    return {"step": np.int32(0), "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
            "opt_state": optimizer.init(variables["params"])}


@functools.lru_cache(maxsize=None)
def _lgca_eval_fwd(model: LGCANetV3):
    """One jitted eval forward per model config (flax Modules are frozen
    dataclasses → hashable). Defining the @jax.jit inside the per-volume
    function created a fresh function object every call — a full retrace
    (and compile/cache-load) per volume of the eval loop."""

    @jax.jit
    def fwd(variables, vol, sl):
        out = model.apply(variables, vol, sl, train=False)
        return jax.nn.sigmoid(out["seg_2d"])

    return fwd


def evaluate_lgca_volume(model: LGCANetV3, variables, sample,
                         chunk: int = 16, mesh=None) -> Dict[str, float]:
    """Whole-volume eval: sweep all z-slices in fixed-size chunks through one
    jitted forward, threshold at 0.5, per-class Dice (None for empty GT —
    utils/util.py:379-390 convention). With ``mesh`` the slice chunk shards
    over the ``data`` axis (volume + params replicated)."""
    volume = jnp.asarray(sample["volume"])
    slices = sample["slices"]
    mask = sample["mask"]
    D = slices.shape[0]
    K = mask.shape[-1]

    fwd = _lgca_eval_fwd(model)
    put = lambda sl: jnp.asarray(sl)
    # commit restored (numpy-leaf) weights to the device ONCE — numpy jit
    # arguments re-upload on every call, which costs ~the weight tree per
    # CHUNK on a tunneled TPU (same bug class as EpisodeRunner's fix)
    variables = jax.device_put(variables)
    if mesh is not None:
        # the padded chunk shards over the data axis — round it up so any
        # mesh size divides it (padded slices are sliced off below)
        n_data = int(mesh.shape["data"])
        chunk = -(-chunk // n_data) * n_data
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P
        repl = NamedSharding(mesh, P())
        variables = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), variables)
        volume = jax.device_put(volume, repl)
        put = lambda sl: jax.device_put(
            jnp.asarray(sl), NamedSharding(mesh, P("data", None, None, None)))

    preds = []
    for z0 in range(0, D, chunk):
        sl = slices[z0:z0 + chunk]
        if sl.shape[0] < chunk:                      # static-shape pad
            sl = np.pad(sl, ((0, chunk - sl.shape[0]), (0, 0), (0, 0), (0, 0)))
        preds.append(np.asarray(fwd(variables, volume, put(sl))))
    pred = np.concatenate(preds)[:D] > 0.5

    out: Dict[str, float] = {}
    for ki in range(K):
        gt = mask[..., ki] > 0.5
        if not gt.any():
            out[f"class_{ki}"] = None
            continue
        p = pred[..., ki]
        out[f"class_{ki}"] = float(2 * (p & gt).sum() / (p.sum() + gt.sum()))
    return out
