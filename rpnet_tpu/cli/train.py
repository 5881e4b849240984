"""Training CLI — fills the reference's empty "# Train" README section.

``python -m rpnet_tpu.cli.train --yaml yamls/example.yml``

Drives the trainer (train/trainer.py) with the YAML's optimizer block:
episodic batches from the train-mode sampler, dice_ce + align loss, Adam with
step decay, periodic orbax checkpoints (epoch_save), stdout tee + TensorBoard
scalars. Eval runs through the separate eval CLI against any saved epoch
checkpoint (``ckpt: .../epoch_NNN`` — see bench_tools/train_eval_roundtrip.py
for the full train→checkpoint→eval loop).
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import time
from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from rpnet_tpu.config import Config, load_yaml
from rpnet_tpu.episode.sampler import EpisodeSampler
from rpnet_tpu.models.factory import model_factory
from rpnet_tpu.train.checkpoint import restore_into, save_checkpoint
from rpnet_tpu.train.trainer import (init_train_state, make_optimizer,
                                     make_train_step)
from rpnet_tpu.utils.logger import Logger

parser = argparse.ArgumentParser(description="RP-Net TPU training")
parser.add_argument("--yaml", required=False, default=None)
parser.add_argument("--platform", default=None)
parser.add_argument("--epochs", type=int, default=None)
parser.add_argument("--episodes-per-epoch", type=int, default=None)


def collate_batch(episodes, target_k: int = None) -> tuple:
    """Stack episodes into a leading E axis, padded to a common k.

    The slice binning clamps k to the shortest volume in each episode
    (few_shot_reader.py:465-473 parity, episode/sampler.slice_bins), so a
    short organ z-range yields fewer than ``k`` slices. Batching needs ONE
    static k (variable shapes would also recompile the train step), so
    short episodes are padded by cycling their slices — duplicated
    support/query pairs, benign for training.
    """
    ks = [e.query_images.shape[0] for e in episodes]
    k = target_k or max(ks)

    def cyc(a, axis):
        n = a.shape[axis]
        if n == k:
            return a
        idx = np.arange(k) % n
        return np.take(a, idx, axis=axis)

    from rpnet_tpu.episode.pipeline import _compact_labels

    supp_img = np.stack([cyc(e.support_images, 1) for e in episodes])  # (E, Sh, k, H, W)
    supp_lab = np.stack([cyc(e.support_labels, 1) for e in episodes])
    qry_img = np.stack([cyc(e.query_images, 0) for e in episodes])     # (E, k, H, W)
    qry_lab = np.stack([cyc(e.query_labels, 0) for e in episodes])
    # {0,1} labels transfer as uint8 (4× smaller host→device upload; the
    # train step widens on device — exact)
    return supp_img, _compact_labels(supp_lab), qry_img, _compact_labels(qry_lab)


def train_lgca(config, args, out_dir):
    """LGCANet_V3 training loop (volume+slices contract, train/lgca.py) —
    the driver the reference's model_factory entry never had."""
    from rpnet_tpu.episode.lgca_data import LGCAVolumeSampler
    from rpnet_tpu.models.factory import model_factory
    from rpnet_tpu.train.lgca import init_lgca_state, make_lgca_train_step
    from rpnet_tpu.train.trainer import make_optimizer

    seed = int(config.get("seed", 0))
    sampler = LGCAVolumeSampler(config["data_dir"], config["train_set_name"],
                                config, mode="train")
    print(f"[length of LGCA train loader {len(sampler)}]")

    epochs = args.epochs or int(config.get("epochs", 100))
    epoch_save = int(config.get("epoch_save", 1))
    steps_per_epoch = args.episodes_per_epoch or len(sampler)

    model = model_factory["LGCANet_V3"](config)
    optimizer = make_optimizer(config, steps_per_epoch=steps_per_epoch)
    state = init_lgca_state(model, config, jax.random.PRNGKey(seed), sampler,
                            optimizer=optimizer)
    start_epoch = 0
    if config.get("ckpt"):
        from rpnet_tpu.train.checkpoint import restore_opt_state
        from rpnet_tpu.train.trainer import fast_forward_opt_state
        variables, start_epoch = restore_into(
            {"params": state["params"], "batch_stats": state["batch_stats"]},
            config["ckpt"], model_name="LGCANet_V3")
        state["params"] = variables["params"]
        state["batch_stats"] = variables["batch_stats"]
        restored_opt = restore_opt_state(state["opt_state"], config["ckpt"])
        if restored_opt is not None:
            state["opt_state"] = restored_opt
        elif start_epoch > 0:   # torch .pth: resume the schedule position
            state["opt_state"] = fast_forward_opt_state(
                state["opt_state"], start_epoch * steps_per_epoch)
        state["step"] = np.int32(start_epoch * steps_per_epoch)

    # multi-chip: shard the slice batch over the mesh's data axis (the
    # reference's torch data_parallel layout, lgca_net_v3.py:600,615,622)
    mesh_shape = config.get("mesh_shape")
    local = jax.local_devices()
    slices_per_step = int(config.get("lgca_slices", 8))
    if mesh_shape or len(local) > 1:
        from rpnet_tpu.parallel.mesh import resolve_local_mesh
        from rpnet_tpu.train.lgca import sharded_lgca_train_step
        mesh = resolve_local_mesh(mesh_shape, devices=local,
                                  batch_divisor=slices_per_step)
        print(f"[LGCA mesh {dict(mesh.shape)} over "
              f"{mesh.devices.size} local devices]")
        step = sharded_lgca_train_step(model, config, optimizer, mesh)
    else:
        step = jax.jit(make_lgca_train_step(model, config, optimizer))
    rng = np.random.RandomState(seed)
    model_dir = os.path.join(out_dir, "model")

    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        losses: List[float] = []
        pending = None
        for j in range(steps_per_epoch):
            # software pipeline: sample volume j while the device runs j-1
            s = sampler.sample(j % len(sampler), rng=rng)
            batch = tuple(map(jnp.asarray, (s["volume"], s["slices"],
                                            s["mask"],
                                            s["downsampled_volume_mask"])))
            if pending is not None:
                losses.append(float(pending["loss"]))
            state, pending = step(state, batch)
        if pending is not None:
            losses.append(float(pending["loss"]))
        wall = time.time() - t0
        print(f"epoch {epoch} loss {np.mean(losses):.4f} "
              f"({steps_per_epoch / max(wall, 1e-9):.2f} volumes/s)")
        if (epoch + 1) % epoch_save == 0:
            # step = COMPLETED epochs (epoch+1): a resume starts at the NEXT
            # epoch instead of re-training the one just saved
            save_checkpoint(os.path.join(model_dir, f"epoch_{epoch:03d}"),
                            epoch + 1, {"params": state["params"],
                                        "batch_stats": state["batch_stats"]},
                            state["opt_state"])
    return state


def main(argv=None):
    args = parser.parse_args(argv)
    if not args.yaml:
        print("No configuration file")
        return None
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    raw_cfg, _ = load_yaml(args.yaml)
    config = Config(raw_cfg)

    from rpnet_tpu.parallel.mesh import maybe_initialize_distributed
    maybe_initialize_distributed(config)

    from rpnet_tpu.utils.device import maybe_enable_compilation_cache
    maybe_enable_compilation_cache(config)

    seed = int(config.get("seed", 0))
    np.random.seed(seed)
    random.seed(seed)
    if config.get("debug_nans"):
        from rpnet_tpu.utils.profiling import enable_nan_debugging
        enable_nan_debugging(True)

    out_dir = config.get("out_dir") or "./results/{}/".format(
        os.path.splitext(os.path.basename(args.yaml))[0])
    model_dir = os.path.join(out_dir, "model")
    os.makedirs(model_dir, exist_ok=True)
    sys.stdout = Logger(os.path.join(out_dir, "log_train"))

    if config.get("net", "RP_Net") == "LGCANet_V3":
        return train_lgca(config, args, out_dir)

    sampler = EpisodeSampler(config["data_dir"], config["train_set_name"],
                             config, mode="train")
    print(f"[length of train loader {len(sampler)}]")

    epochs = args.epochs or int(config.get("epochs", 100))
    batch_size = int(config.get("batch_size", 4))
    epi_per_epoch = args.episodes_per_epoch or len(sampler)
    epoch_save = int(config.get("epoch_save", 1))
    steps_per_epoch = max(1, -(-epi_per_epoch // batch_size))

    # refinement_unroll auto (None): fully unroll the train-horizon scan —
    # measured 0.211 → 0.194 s/step on the full-size step (one-time compile
    # cost, amortized over the run); YAML value overrides
    if config.get("refinement_unroll", None) is None:
        config = config.replace(
            refinement_unroll=int(config["n_iter_refinement"]))
    model = model_factory[config.get("net", "RP_Net")](
        config, align=True, num_iter=config["n_iter_refinement"])
    optimizer = make_optimizer(config, steps_per_epoch=steps_per_epoch)
    state = init_train_state(model, config, jax.random.PRNGKey(seed),
                             optimizer=optimizer)
    if config.get("pretrained_path"):
        from rpnet_tpu.train.checkpoint import apply_pretrained
        warm = apply_pretrained({"params": state["params"],
                                 "batch_stats": state["batch_stats"]}, config)
        state["params"] = warm["params"]
        state["batch_stats"] = warm["batch_stats"]
    start_epoch = 0
    if config.get("ckpt"):
        from rpnet_tpu.train.checkpoint import restore_opt_state
        variables, start_epoch = restore_into(
            {"params": state["params"], "batch_stats": state["batch_stats"]},
            config["ckpt"], model_name=config.get("net", "RP_Net"))
        state["params"] = variables["params"]
        state["batch_stats"] = variables["batch_stats"]
        # resume Adam moments + schedule step when the checkpoint has them
        # (torch .pth checkpoints don't; orbax ones from save_checkpoint do)
        restored_opt = restore_opt_state(state["opt_state"], config["ckpt"])
        if restored_opt is not None:
            state["opt_state"] = restored_opt
        elif start_epoch > 0:   # torch .pth: resume the schedule position
            from rpnet_tpu.train.trainer import fast_forward_opt_state
            state["opt_state"] = fast_forward_opt_state(
                state["opt_state"], start_epoch * steps_per_epoch)
        state["step"] = np.int32(start_epoch * steps_per_epoch)

    # AOT compile (one compile total — plain jit recompiles on step 2 because
    # output param layouts re-key the cache; utils/device.aot_compile_step)
    from rpnet_tpu.utils.device import aot_compile_step
    H, W = config.get("crop_size", [256, 256])
    k = int(config.get("k", 12))
    E, Sh = batch_size, int(config.get("n_shot", 1))
    train_step = aot_compile_step(
        make_train_step(model, config, optimizer), state,
        ((E, Sh, k, H, W), (E, Sh, k, H, W), (E, k, H, W), (E, k, H, W)),
        batch_dtypes=(np.float32, np.uint8, np.float32, np.uint8))

    writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter
        writer = SummaryWriter(os.path.join(out_dir, "runs"))
    except Exception:
        pass

    order = list(range(len(sampler)))
    for epoch in range(start_epoch, epochs):
        random.shuffle(order)
        t0 = time.time()
        losses: List[float] = []
        idx = 0
        pending = None   # last dispatched step's metrics (device futures)
        while idx < epi_per_epoch:
            take = [order[(idx + j) % len(order)] for j in range(batch_size)]
            # assemble the NEXT batch while the device still runs the
            # previous step (jax async dispatch) — fetching the loss below
            # is the sync point, so it happens after host work, not before
            episodes = [sampler.sample(t) for t in take]
            batch = collate_batch(episodes, target_k=k)
            if pending is not None:
                losses.append(float(pending["loss"]))
            state, pending = train_step(state, tuple(map(jnp.asarray, batch)))
            idx += batch_size
        if pending is not None:
            losses.append(float(pending["loss"]))
        wall = time.time() - t0
        mean_loss = float(np.mean(losses)) if losses else float("nan")
        print(f"epoch {epoch} loss {mean_loss:.4f} "
              f"({epi_per_epoch / max(wall, 1e-9):.2f} episodes/s)")
        if writer is not None:
            writer.add_scalar("train/loss", mean_loss, epoch)
        if (epoch + 1) % epoch_save == 0:
            # step = COMPLETED epochs (epoch+1); see train_lgca note
            save_checkpoint(os.path.join(model_dir, f"epoch_{epoch:03d}"),
                            epoch + 1, {"params": state["params"],
                                        "batch_stats": state["batch_stats"]},
                            state["opt_state"])
    if writer is not None:
        writer.close()
    return state


if __name__ == "__main__":
    main()
