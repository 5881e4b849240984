"""Training loop — the component the reference never shipped (README.md:14's
"# Train" section is empty; SURVEY.md §7 step 7).

Semantics assembled from what the reference defines but never wires up:
  * optimizer block from the YAML (example.yml:62-73): Adam, init_lr,
    weight_decay; stepwise lr schedule every ``scheduler_step`` epochs;
  * loss: ``dice_ce`` on the final output logits (example.yml:115,
    net/rp_net.py:123-127) + ``align_loss_scaler`` × PANet align loss
    (net/rp_net.py:394-440);
  * episodes come from the train-mode sampler (k random-augmented slices);
    the registration prior is computed in-graph with gradients stopped
    (the reference detaches it by construction — it is produced in the data
    loader, few_shot_reader.py:109-198).

TPU design: the train step is ONE jit over a mesh — episodes shard over the
``data`` axis, params replicate (or TP-shard via parallel/mesh rules);
gradient psum is inserted by GSPMD.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rpnet_tpu.models.losses import LOSS_REGISTRY, dice_ce
from rpnet_tpu.registration.fit import register_episode


@dataclasses.dataclass
class TrainState:
    step: int
    params: Any
    batch_stats: Any
    opt_state: Any

    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def make_optimizer(config, steps_per_epoch: int = 1):
    """Adam + weight decay + step decay from the YAML optimizer block.

    ``scheduler_step`` counts EPOCHS (torch StepLR convention); optax
    schedules count optimizer updates, so the transition period is scaled
    by ``steps_per_epoch`` (updates per epoch = ceil(episodes/batch)).
    """
    init_lr = float(config.get("init_lr", 1e-5))
    wd = float(config.get("weight_decay", 0.0))
    step_epochs = int(config.get("scheduler_step", 30) or 0)

    if step_epochs > 0:
        # ×0.1 every scheduler_step EPOCHS = scheduler_step×steps_per_epoch updates
        sched = optax.exponential_decay(
            init_lr, transition_steps=step_epochs * max(int(steps_per_epoch), 1),
            decay_rate=0.1, staircase=True)
    else:
        sched = init_lr
    opt_name = str(config.get("optimizer", "Adam")).lower()
    if opt_name == "adam":
        base = optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)
    elif opt_name == "sgd":
        base = optax.chain(optax.add_decayed_weights(wd),
                           optax.sgd(sched, momentum=float(config.get("momentum", 0.9))))
    else:
        raise NotImplementedError(opt_name)
    return base


def fast_forward_opt_state(opt_state, n_updates: int):
    """Set every ``count`` leaf (Adam bias correction + LR-schedule position)
    of a FRESH opt_state to ``n_updates``.

    Used when resuming from a checkpoint that carries no opt_state (reference
    torch ``.pth`` files): without this the step-decay schedule restarts at
    ``init_lr`` — after 48 epochs with ``scheduler_step: 30`` that is a 10×
    too-high LR (torch ``StepLR(last_epoch=...)`` would resume decayed).
    Moments stay zero (not recoverable), matching torch's behavior when only
    a state_dict is loaded.
    """
    import jax.numpy as jnp

    def fix(path, leaf):
        if jax.tree_util.keystr(path).endswith("count"):
            return jnp.asarray(n_updates, jnp.asarray(leaf).dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(fix, opt_state)


def make_train_step(model, config, optimizer) -> Callable:
    """Build the jittable per-batch train step.

    Batch layout (E = episodes per step, sharded over ``data``):
      supp_img, supp_lab: (E, Sh, k, H, W)
      qry_img, qry_lab:   (E, k, H, W)
    """
    affine_iters = int(config.get("reg_affine_iters", 50))
    demons_iters = (int(config.get("reg_demons_iters", 50))
                    if config.get("do_deformable", False) else 0)
    fit_scale = int(config.get("reg_fit_scale", 1))
    reg_sampler = str(config.get("reg_sampler", "matmul"))
    reg_lr = float(config.get("reg_lr", 0.01))
    reg_sigma = float(config.get("reg_sigma", 2.0))
    n_way = int(config.get("n_way", 1))
    align_scaler = float(config.get("align_loss_scaler", 1.0))
    use_registration = bool(config.get("use_registration_loss", True))
    deep_supervision = bool(config.get("deep_supervision", False))
    # "equal" (run C: pushes iter 0 to do all the work) | "linear" (weight
    # ∝ iteration index + 1: every horizon gets signal, later ones dominate —
    # contraction pressure without sacrificing the endpoint)
    ds_weights = str(config.get("deep_supervision_weights", "equal"))
    # train default stays f32 (compute_dtype: None = auto): the bf16 train
    # step measured SLOWER (0.217 vs 0.200 s, docs/perf_trace_r3.md) — the
    # step is registration/correlation-bound, not weight-MXU-bound
    compute_dtype = jnp.dtype(config.get("compute_dtype") or "float32")
    from rpnet_tpu.models.losses import make_seg_loss
    seg_loss = make_seg_loss(config.get("loss", "dice_ce"))

    def _cast(tree, dtype):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, tree)

    def episode_loss(params, batch_stats, supp_img, supp_lab, qry_img, qry_lab):
        if not use_registration:
            # use_registration_loss: False — raw (unwarped) support feeds the
            # network; the prior is the raw support label (the reference's
            # reader would skip get_registration_field here,
            # few_shot_reader.py:555-565)
            appr, supp_in, fore = supp_lab[0], supp_img[0], supp_lab[0]
        else:
            # stage 1: registration prior (no gradient; stop_gradient fence)
            reg = register_episode(supp_img[0], qry_img, supp_lab[0],
                                   affine_iters=affine_iters,
                                   demons_iters=demons_iters,
                                   lr=reg_lr, sigma=reg_sigma,
                                   fit_scale=fit_scale, sampler=reg_sampler)
            appr = jax.lax.stop_gradient(reg.warped_label)
            supp_in = jax.lax.stop_gradient(reg.affine_src)
            fore = jax.lax.stop_gradient(reg.affine_label)

        supp_t = supp_in[None, None, ..., None]
        fore_t = fore[None, None]
        if n_way > 1:
            # keep the trained softmax arity consistent with eval: the
            # pipeline tiles the sampled supports across ways (reference
            # reader semantics, few_shot_reader.py:294-298) giving 1+n_way
            # output channels — train with the same layout
            supp_t = jnp.tile(supp_t, (n_way,) + (1,) * (supp_t.ndim - 1))
            fore_t = jnp.tile(fore_t, (n_way,) + (1,) * (fore_t.ndim - 1))
        # mixed precision (compute_dtype: bfloat16): cast params (master copy
        # stays f32; the casts are differentiable so grads accumulate back to
        # f32) but NOT activations — matching the eval path (EpisodeRunner),
        # so matmuls/convs take one bf16 operand (MXU) while the scan carry
        # and the loss stay f32
        net_params = _cast(params, compute_dtype)
        net_stats = _cast(batch_stats, compute_dtype)
        out, mutated = model.apply(
            {"params": net_params, "batch_stats": net_stats},
            supp_t, fore_t, 1.0 - fore_t, qry_img[..., None], appr,
            train=True, mutable=["batch_stats"])
        logits = out["output"].astype(jnp.float32)
        labels = qry_lab.astype(jnp.int32)
        if deep_supervision:
            # supervise EVERY refinement iteration (mean over the scan axis):
            # the recurrence is then trained to map ANY intermediate mask
            # toward GT — a contraction — instead of only the T-step
            # composite, which drifts when eval extends the horizon
            # (test_rpnet.py:51 runs 10 iterations on a net trained at 4;
            # measured: final-only training peaks at iter 1-2 and decays)
            refl = out["refinement"].astype(jnp.float32)      # (T, B, H, W, C)
            per_iter = jax.vmap(lambda lg: seg_loss(lg, labels))(refl)  # (T,)
            if ds_weights == "linear":
                w = jnp.arange(1, per_iter.shape[0] + 1, dtype=jnp.float32)
                seg = jnp.sum(per_iter * w / jnp.sum(w))
            else:
                seg = jnp.mean(per_iter)
        else:
            seg = seg_loss(logits, labels)
        loss = seg + align_scaler * out["align_loss"].astype(jnp.float32)
        metrics = {"seg_loss": seg, "align_loss": out["align_loss"]}
        new_stats = jax.tree_util.tree_map(
            lambda new, old: new.astype(old.dtype),
            mutated["batch_stats"], batch_stats)
        return loss, (metrics, new_stats)

    def batch_loss(params, batch_stats, batch):
        supp_img, supp_lab, qry_img, qry_lab = batch
        # labels may arrive uint8 (compact transfer, cli/train.collate_batch)
        # — widen on device; exact, the values are {0, 1}
        supp_lab = supp_lab.astype(jnp.float32)
        qry_lab = qry_lab.astype(jnp.float32)
        losses, (metrics, new_stats) = jax.vmap(
            episode_loss, in_axes=(None, None, 0, 0, 0, 0),
            out_axes=(0, (0, 0)))(params, batch_stats, supp_img, supp_lab,
                                  qry_img, qry_lab)
        # average the vmapped BN stats (sync-BN-like across episodes)
        new_stats = jax.tree_util.tree_map(lambda x: jnp.mean(x, axis=0), new_stats)
        metrics = jax.tree_util.tree_map(jnp.mean, metrics)
        return jnp.mean(losses), (metrics, new_stats)

    def train_step(state: Dict, batch):
        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            batch_loss, has_aux=True)(state["params"], state["batch_stats"], batch)
        updates, opt_state = optimizer.update(grads, state["opt_state"],
                                              state["params"])
        params = optax.apply_updates(state["params"], updates)
        new_state = {"step": state["step"] + 1, "params": params,
                     "batch_stats": new_stats, "opt_state": opt_state}
        metrics = dict(metrics, loss=loss)
        return new_state, metrics

    return train_step


def init_train_state(model, config, rng, sample_shapes=None,
                     optimizer=None) -> Dict:
    """Initialize params/batch_stats/optimizer for training.

    Pass the SAME ``optimizer`` used for train steps so the opt_state
    matches its schedule (otherwise a default one is built here).
    """
    from rpnet_tpu.utils.device import init_on_host_cpu

    H, W = config.get("crop_size", [256, 256])
    k = int(config.get("k", 12))
    dummy = (jnp.zeros((1, 1, k, H, W, 1), jnp.float32),
             jnp.zeros((1, 1, k, H, W), jnp.float32),
             jnp.ones((1, 1, k, H, W), jnp.float32),
             jnp.zeros((k, H, W, 1), jnp.float32),
             jnp.zeros((k, H, W), jnp.float32))
    variables = init_on_host_cpu(model, rng, dummy)
    if optimizer is None:
        optimizer = make_optimizer(config)
    opt_state = optimizer.init(variables["params"])
    # step as a strong-typed int32 scalar: a weak-typed python 0 here makes
    # the SECOND train_step call a cache miss (the returned step is a strong
    # int32 array) — i.e. a full ~2-minute recompile of the training program
    return {"step": np.int32(0), "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
            "opt_state": opt_state}


def sharded_train_step(model, config, optimizer, mesh):
    """jit the train step over a mesh: batch on ``data``, params per TP rule.

    State leaves (params AND the optimizer's param-shaped moments) are
    device_put with the tensor-parallel rule so GSPMD keeps TP shardings
    stable across steps instead of re-deciding layouts per output.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    step = make_train_step(model, config, optimizer)

    n_model = mesh.shape.get("model", 1)

    def leaf_sharding(leaf):
        shape = getattr(leaf, "shape", ())
        if (n_model > 1 and len(shape) == 4 and shape[-1] >= 256
                and shape[-1] % n_model == 0):
            return NamedSharding(mesh, P(None, None, None, "model"))
        return NamedSharding(mesh, P())

    def spec_for_batch(ndim):
        return NamedSharding(mesh, P(*(["data"] + [None] * (ndim - 1))))

    def shard_state(state):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, leaf_sharding(x)), state)

    jitted = jax.jit(step, donate_argnums=(0,))

    def run(state, batch):
        # idempotent: already-sharded leaves are a no-op device_put
        state = shard_state(state)
        batch = tuple(jax.device_put(b, spec_for_batch(np.ndim(b))) for b in batch)
        return jitted(state, batch)

    return run
