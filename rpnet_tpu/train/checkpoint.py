"""Checkpoint save/restore with the reference's overlay semantics.

The reference stores ``{'epoch', 'state_dict', 'optimizer'}`` and restores by
OVERLAYING the checkpoint's state_dict onto a freshly-initialized one —
tolerating missing/extra keys — with the optimizer restore disabled
(test_rpnet.py:86-96). Here:

  * checkpoints are orbax-saved pytrees ``{'step', 'variables', 'opt_state'}``;
  * :func:`overlay_restore` merges a (possibly partial) checkpoint variables
    tree onto freshly-initialized variables, keeping fresh leaves where the
    checkpoint has none — the same warm-start behavior;
  * torch ``.pth`` checkpoints are accepted too and converted on the fly
    (train/convert.py) so reference checkpoints keep working.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _is_leaf_dict(d) -> bool:
    return isinstance(d, dict)


def overlay(dst: Dict[str, Any], src: Dict[str, Any], path: str = "") -> Dict[str, Any]:
    """Recursively overlay src onto dst (missing/extra keys tolerated)."""
    out = dict(dst)
    for k, v in src.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = overlay(out[k], v, f"{path}/{k}")
        elif k in out:
            cur = out[k]
            arr = np.asarray(v)
            if hasattr(cur, "shape") and tuple(cur.shape) != tuple(arr.shape):
                raise ValueError(
                    f"checkpoint shape mismatch at {path}/{k}: "
                    f"{arr.shape} vs model {tuple(cur.shape)}")
            # cur may be a ShapeDtypeStruct (structure-only fast restore) —
            # it carries .dtype without being array-convertible
            dtype = cur.dtype if hasattr(cur, "dtype") else np.asarray(cur).dtype
            out[k] = arr.astype(dtype)
        else:
            out[k] = np.asarray(v)   # extra key kept (state.update semantics)
    return out


def save_checkpoint(path: str, step: int, variables, opt_state=None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = {"step": step,
            "variables": jax.tree_util.tree_map(np.asarray, variables)}
    if opt_state is not None:
        ckpt["opt_state"] = jax.tree_util.tree_map(np.asarray, opt_state)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, ckpt, force=True)


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load an orbax dir or a torch .pth file; returns the raw tree."""
    if path.endswith((".pth", ".pt", ".tar")) or os.path.isfile(path):
        from rpnet_tpu.train.convert import load_torch_checkpoint
        return load_torch_checkpoint(path)
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def restore_opt_state(fresh_opt_state, path: str):
    """Restore a saved opt_state INTO the structure of a fresh one.

    orbax flattens optax NamedTuples to dicts on a bare restore; passing the
    fresh opt_state as the item template recovers the exact pytree (Adam
    moments + schedule count). Returns None if the checkpoint is a torch
    .pth (reference checkpoints carry a torch optimizer state — not
    transferable) or stores no opt_state.
    """
    if path.endswith((".pth", ".pt", ".tar")) or os.path.isfile(path):
        return None
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    # structure check via METADATA (no tensor reads) — a bare probe restore
    # would read the whole checkpoint (params + moments) a second time
    meta_ok = True
    try:
        meta = ckptr.metadata(os.path.abspath(path))
        tree = getattr(getattr(meta, "item_metadata", meta), "tree", None)
        has_opt = bool(tree) and tree.get("opt_state") is not None
    except Exception:   # noqa: BLE001 — old layouts without metadata
        # without metadata we can't tell whether opt_state EXISTS; the
        # partial restore with transforms={} would silently hand back the
        # fresh template for absent keys, so go straight to the probe path
        meta_ok, has_opt = False, False
    if meta_ok and not has_opt:
        return None
    if meta_ok:
        try:
            # partial restore: only the opt_state subtree is read from disk
            item = {"opt_state": fresh_opt_state}
            rargs = jax.tree_util.tree_map(lambda _: ocp.RestoreArgs(), item)
            out = ckptr.restore(os.path.abspath(path), item=item,
                                transforms={}, restore_args=rargs)
            return out["opt_state"]
        except Exception:   # noqa: BLE001
            pass
    # fallback: full templated restore (variables template from a probe);
    # the probe itself proves whether opt_state is really in the checkpoint
    probe = ckptr.restore(os.path.abspath(path))
    if not (isinstance(probe, dict) and probe.get("opt_state") is not None):
        return None
    template = {"step": 0,
                "variables": jax.tree_util.tree_map(np.asarray, probe["variables"]),
                "opt_state": fresh_opt_state}
    full = ckptr.restore(os.path.abspath(path), item=template)
    return full["opt_state"]


def apply_pretrained(variables, config):
    """Honor the YAML ``pretrained_path`` backbone warm start.

    Reference semantics (net/rp_net.py:205-214): with the vgg backbone the
    path is a torchvision VGG16 checkpoint loaded positionally into the
    encoder (net/vgg.py:65-74); with the UNet backbone it is a full RP_Net
    torch checkpoint overlaid onto the whole model. Returns (possibly
    updated) variables.
    """
    path = config.get("pretrained_path") if hasattr(config, "get") else None
    if not path:
        return variables
    backbone = config.get("backbone", "vgg")
    if backbone == "vgg":
        import torch

        from rpnet_tpu.train.convert import convert_torchvision_vgg16

        try:   # torchvision weight files load fine without pickle execution
            raw = torch.load(path, map_location="cpu", weights_only=True)
        except Exception:   # noqa: BLE001 — legacy full-object checkpoints
            raw = torch.load(path, map_location="cpu", weights_only=False)
        sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
        tree = convert_torchvision_vgg16(sd)
        print(f"[vgg warm start from {path}]")
        return {**variables,
                "params": overlay(variables["params"], tree["params"])}
    out, _ = restore_into(variables, path,
                          model_name=config.get("net", "RP_Net"))
    print(f"[{backbone} warm start from {path}]")
    return out


def restore_into(variables, path: str, model_name: str = "RP_Net"):
    """Overlay-restore a checkpoint into freshly-initialized variables.

    Returns (variables, start_step). torch checkpoints are converted first.

    ``variables`` may also be a tree of ``jax.ShapeDtypeStruct`` (from
    ``jax.eval_shape`` over ``model.init``): if the checkpoint covers EVERY
    leaf, the expensive real init is never needed. Any leaf the checkpoint
    does not cover is then unrestorable and raises (the caller falls back to
    a real init + overlay).
    """
    ckpt = load_checkpoint(path)
    step = int(ckpt.get("step", ckpt.get("epoch", 0)) or 0)
    if "variables" in ckpt:
        src = ckpt["variables"]
    elif "state_dict" in ckpt:
        sd = ckpt["state_dict"]
        # route to the model family's converter: LGCA state_dicts have a
        # disjoint key namespace (context_net./unet.) — the RP_Net mapper
        # would silently match NOTHING and leave the random init in place
        is_lgca = ("LGCA" in (model_name or "")
                   or any(k.startswith("context_net.") for k in sd))
        if is_lgca:
            from rpnet_tpu.train.convert import convert_lgca_state_dict
            src = convert_lgca_state_dict(sd)
        else:
            from rpnet_tpu.train.convert import convert_state_dict
            src = convert_state_dict(sd, variables)
        matched = sum(1 for _ in jax.tree_util.tree_leaves(src["params"]))
        if matched == 0:
            raise ValueError(
                f"torch checkpoint {path}: no keys converted for model "
                f"{model_name!r} — wrong checkpoint/model pairing?")
    else:
        src = ckpt
    src = {k: v for k, v in src.items() if not k.startswith("_")}
    merged = overlay(variables, src)
    missing = [p for p, l in jax.tree_util.tree_leaves_with_path(merged)
               if isinstance(l, jax.ShapeDtypeStruct)]
    if missing:
        raise IncompleteCheckpointError(
            f"checkpoint {path} does not cover "
            f"{len(missing)} model leaves (e.g. "
            f"{jax.tree_util.keystr(missing[0])}) — a structure-only "
            f"restore needs full coverage; fall back to a real init")
    return jax.tree_util.tree_map(lambda x: np.asarray(x), merged), step


class IncompleteCheckpointError(ValueError):
    """A structure-only restore found leaves the checkpoint doesn't cover."""


def init_or_restore(model, config, dummy, seed: int = 0, train: bool = False,
                    fast: bool = True):
    """Build model variables honoring ``pretrained_path``/``ckpt``.

    Fast path: when a full non-torch checkpoint is configured, a
    ``jax.eval_shape`` structure (pure tracing, no compute, no compiles)
    stands in for the real init — the checkpoint replaces every value
    anyway. Worth ~30 s per CLI invocation on a tunneled TPU. Falls back to
    ``init_on_host_cpu`` + overlay for partial/torch checkpoints.

    Returns ``(variables, start_step)``.
    """
    ckpt = config.get("ckpt")
    if fast and ckpt and not config.get("pretrained_path") and not (
            ckpt.endswith((".pth", ".pt", ".tar")) or os.path.isfile(ckpt)):
        struct = jax.eval_shape(
            lambda r: model.init(r, *dummy, train=train),
            jax.random.PRNGKey(seed))
        try:
            print(f"[Loading model from {ckpt}]")
            return restore_into(struct, ckpt,
                                model_name=config.get("net", "RP_Net"))
        except IncompleteCheckpointError as e:
            print(f"[partial checkpoint — full init: {e}]")
    from rpnet_tpu.utils.device import init_on_host_cpu
    variables = init_on_host_cpu(model, jax.random.PRNGKey(seed), dummy,
                                 train=train)
    if config.get("pretrained_path"):
        variables = apply_pretrained(variables, config)
    step = 0
    if ckpt:
        print(f"[Loading model from {ckpt}]")
        variables, step = restore_into(variables, ckpt,
                                       model_name=config.get("net", "RP_Net"))
    return variables, step
