"""One-way PyTorch → JAX checkpoint converter (SURVEY.md §5 checkpoint/resume).

Maps reference RP_Net state_dicts (net/rp_net.py / net/unet.py / net/vgg.py
module naming) onto this framework's flax variable tree. Conv weights
transpose OIHW → HWIO; BatchNorm splits into params (scale/bias) and
batch_stats (mean/var). Unused reference submodules (cre.w_context / cre.out,
net/rp_net.py:60-74 — defined but never called) are skipped.

Also converts torchvision VGG16 ``features.*`` checkpoints for the backbone
warm start the reference does positionally (net/vgg.py:65-74).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------- naming maps

_CONV_BLOCK = {"conv.0": "conv1", "conv.1": "norm1", "conv.3": "conv2", "conv.4": "norm2"}

_UNET_BLOCKS = {"Conv1": "enc1", "Conv2": "enc2", "Conv3": "enc3", "Conv4": "enc4",
                "Conv5": "enc5", "Up_conv5": "dec5", "Up_conv4": "dec4"}
_UNET_UP = {"Up5": "up5", "Up4": "up4"}

_VGG_STAGE = {"0": ("stage1", 2), "2": ("stage2", 2), "4": ("stage3", 3),
              "6": ("stage4", 3), "8": ("stage5", 3)}

_RESNET_STAGE = {"5": "stage2", "6": "stage3", "7": "stage4"}


def _torch_module_path(torch_key: str) -> Optional[Tuple[Tuple[str, ...], str]]:
    """Map one torch state_dict key → (flax module path, tail kind).

    Returns None for keys that have no counterpart (dead submodules,
    num_batches_tracked).
    """
    parts = torch_key.split(".")
    tail = parts[-1]
    if tail == "num_batches_tracked":
        return None

    def conv_or_norm(block_path, inner):
        """inner like 'conv1' or 'norm1' → full flax path pieces."""
        if inner.startswith("conv"):
            return block_path + (inner, "conv")
        return block_path + (inner, "bn")

    # ---- encoder: U_Net ----
    m = re.match(r"encoder\.(Conv\d|Up_conv\d)\.conv\.(\d)\.", torch_key)
    if m:
        block = _UNET_BLOCKS[m.group(1)]
        inner = _CONV_BLOCK.get(f"conv.{m.group(2)}")
        if inner is None:
            return None
        return conv_or_norm(("encoder", block), inner), tail
    m = re.match(r"encoder\.(Up\d)\.up\.(\d)\.", torch_key)
    if m:
        block = _UNET_UP[m.group(1)]
        idx = m.group(2)
        if idx == "1":
            return ("encoder", block, "conv", "conv"), tail
        if idx == "2":
            return ("encoder", block, "norm", "bn"), tail
        return None

    # ---- encoder: VGG (model key 'encoder.features.i.j') ----
    m = re.match(r"(?:encoder\.)?features\.(\d+)\.(\d+)\.", torch_key)
    if m and m.group(1) in _VGG_STAGE:
        stage, n_convs = _VGG_STAGE[m.group(1)]
        conv_idx = int(m.group(2)) // 2 + 1     # 0,2,4 → conv1..3
        if conv_idx > n_convs:
            return None
        return ("encoder", f"{stage}_conv{conv_idx}", "conv"), tail

    # ---- encoder: ResNet18 stem + stages ----
    if torch_key.startswith("encoder.backbone.0."):
        return ("encoder", "stem_conv", "conv"), tail
    if torch_key.startswith("encoder.backbone.1."):
        return ("encoder", "stem_bn", "bn"), tail
    m = re.match(r"encoder\.backbone\.4\.(\d)\.(conv\d|bn\d|downsample\.\d)\.", torch_key)
    if m:
        block = f"layer1_{m.group(1)}"
        return _resnet_inner(("encoder", block), m.group(2)), tail
    m = re.match(r"encoder\.backbone\.([567])\.(\d)\.(conv\d|bn\d|downsample\.\d)\.", torch_key)
    if m:
        block = f"{_RESNET_STAGE[m.group(1)]}_{m.group(2)}"
        return _resnet_inner(("encoder", block), m.group(3)), tail

    # ---- CRE ----
    # (cre.q.0.* is handled specially in convert_state_dict: the fused 1×1
    # conv over [corr, fm1] splits into q_conv_corr + q_conv_fm by linearity)
    m = re.match(r"cre\.(w_k|w_q)\.(\d)\.", torch_key)
    if m:
        name, idx = m.group(1), m.group(2)
        if idx == "0":
            return ("cre", f"{name}_conv", "conv"), tail
        if idx == "1":
            return ("cre", f"{name}_norm", "bn"), tail
    m = re.match(r"cre\.q\.1\.", torch_key)
    if m:
        return ("cre", "q_norm", "bn"), tail
    if torch_key.startswith(("cre.w_context.", "cre.out.")):
        return None   # dead submodules in the reference

    return None


def _resnet_inner(block_path, inner: str):
    if inner.startswith("conv"):
        return block_path + (inner, "conv")
    if inner.startswith("bn"):
        return block_path + (inner, "bn")
    if inner == "downsample.0":
        return block_path + ("down_conv", "conv")
    if inner == "downsample.1":
        return block_path + ("down_bn", "bn")
    raise AssertionError(inner)


# ------------------------------------------------------------------- plumbing

def _set_nested(tree: Dict, path, value):
    cur = tree
    for p in path[:-1]:
        cur = cur.setdefault(p, {})
    cur[path[-1]] = value


def convert_state_dict(state_dict: Dict[str, Any], reference_variables=None):
    """torch state_dict → flax {'params', 'batch_stats'} tree (numpy leaves)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    unmatched = []

    # the CRE's fused 1×1 conv splits into corr/fm branches (see models/cre.py);
    # corr channel count = total_in - C where C comes from the w_k conv
    if "cre.q.0.weight" in state_dict:
        qw = np.asarray(getattr(state_dict["cre.q.0.weight"], "numpy",
                                lambda: state_dict["cre.q.0.weight"])())
        wk = state_dict.get("cre.w_k.0.weight")
        C = (np.asarray(getattr(wk, "numpy", lambda: wk)()).shape[0]
             if wk is not None else qw.shape[1])
        d2 = qw.shape[1] - C
        _set_nested(params, ("cre", "q_conv_corr", "conv", "kernel"),
                    np.transpose(qw[:, :d2], (2, 3, 1, 0)))
        _set_nested(params, ("cre", "q_conv_fm", "conv", "kernel"),
                    np.transpose(qw[:, d2:], (2, 3, 1, 0)))
    if "cre.q.0.bias" in state_dict:
        qb = state_dict["cre.q.0.bias"]
        _set_nested(params, ("cre", "q_conv_fm", "conv", "bias"),
                    np.asarray(getattr(qb, "numpy", lambda: qb)()))

    for key, val in state_dict.items():
        if key in ("cre.q.0.weight", "cre.q.0.bias"):
            continue
        arr = np.asarray(getattr(val, "numpy", lambda: val)())
        mapped = _torch_module_path(key)
        if mapped is None:
            unmatched.append(key)
            continue
        path, tail = mapped
        if path[-1] == "conv":
            if tail == "weight":
                _set_nested(params, path + ("kernel",), np.transpose(arr, (2, 3, 1, 0)))
            elif tail == "bias":
                _set_nested(params, path + ("bias",), arr)
            else:
                unmatched.append(key)
        elif path[-1] == "bn":
            if tail == "weight":
                _set_nested(params, path + ("scale",), arr)
            elif tail == "bias":
                _set_nested(params, path + ("bias",), arr)
            elif tail == "running_mean":
                _set_nested(stats, path + ("mean",), arr)
            elif tail == "running_var":
                _set_nested(stats, path + ("var",), arr)
            else:
                unmatched.append(key)
        else:
            unmatched.append(key)
    out = {"params": params, "batch_stats": stats}
    out["_unmatched_keys"] = unmatched
    return out


# --------------------------------------------------------------- LGCA naming

_LGCA_RES_INNER = {"conv1": "conv1", "conv2": "conv2", "shortcut.0": "shortcut"}


def _lgca_module_path(torch_key: str):
    """Map one LGCANet_V3 state_dict key → (flax path, kind).

    kind ∈ {'conv2d', 'conv3d', 'bn'}; the path already contains the inner
    'conv' segment for TorchConv-wrapped convs. Returns None for keys with no
    counterpart: the dead ``forw4`` stage (defined but never called,
    lgca_net_v3.py:79-82,97-113), the attention ``w_q``/``w_k`` linears
    (params exist but their use is commented out, lgca_net_v3.py:285-293,
    309-314), InstanceNorm3d (no params), and num_batches_tracked.
    """
    if torch_key.endswith("num_batches_tracked"):
        return None

    if torch_key.startswith("context_net."):
        rest = torch_key[len("context_net."):]
        if rest.startswith("preBlock.0."):
            return ("context_net", "pre_conv1"), "conv3d"
        if rest.startswith("preBlock.3."):
            return ("context_net", "pre_conv2"), "conv3d"
        m = re.match(r"forw([123])\.(\d)\.(conv1|conv2|shortcut\.0)\.", rest)
        if m:
            inner = _LGCA_RES_INNER[m.group(3)]
            return ("context_net", f"forw{m.group(1)}_{m.group(2)}", inner), "conv3d"
        if rest.startswith("dsv.1."):
            return ("context_net", "dsv_conv"), "conv3d"
        return None   # forw4 (dead), InstanceNorm has no params

    if torch_key.startswith("unet."):
        rest = torch_key[len("unet."):]
        m = re.match(r"Conv(\d)\.conv\.(\d)\.", rest)
        if m:
            inner = _CONV_BLOCK.get(f"conv.{m.group(2)}")
            if inner is None:
                return None
            if inner.startswith("conv"):
                return ("unet", f"enc{m.group(1)}", inner, "conv"), "conv2d"
            return ("unet", f"enc{m.group(1)}", inner, "bn"), "bn"
        m = re.match(r"Up_conv(\d)\.conv\.(\d)\.", rest)
        if m:
            inner = _CONV_BLOCK.get(f"conv.{m.group(2)}")
            if inner is None:
                return None
            if inner.startswith("conv"):
                return ("unet", f"dec{m.group(1)}", inner, "conv"), "conv2d"
            return ("unet", f"dec{m.group(1)}", inner, "bn"), "bn"
        m = re.match(r"Up(\d)\.up\.(\d)\.", rest)
        if m:
            if m.group(2) == "1":
                return ("unet", f"up{m.group(1)}", "conv", "conv"), "conv2d"
            if m.group(2) == "2":
                return ("unet", f"up{m.group(1)}", "norm", "bn"), "bn"
            return None
        m = re.match(r"Att(\d)\.(W_g|W_x|psi)\.(\d)\.", rest)
        if m:
            name = m.group(2).lower()
            if m.group(3) == "0":
                return ("unet", f"att{m.group(1)}", name, "conv"), "conv2d"
            return ("unet", f"att{m.group(1)}", f"{name}_norm", "bn"), "bn"
        m = re.match(r"self_attention(\d)\.att_layer_(\d)\.global_pooling_(2D|3D)\.0\.", rest)
        if m:
            conv = "pool2d_conv" if m.group(3) == "2D" else "pool3d_conv"
            kind = "conv2d" if m.group(3) == "2D" else "conv3d"
            return ("unet", f"self_attention{m.group(1)}",
                    f"att_layer_{m.group(2)}", conv), kind
        m = re.match(r"self_attention(\d)\.conv\.([01])\.", rest)
        if m:
            if m.group(2) == "0":
                return ("unet", f"self_attention{m.group(1)}", "fuse_conv",
                        "conv"), "conv2d"
            return ("unet", f"self_attention{m.group(1)}", "fuse_norm",
                    "bn"), "bn"
        if rest.startswith("Conv_1x1."):
            return ("unet", "final_conv", "conv"), "conv2d"
        return None   # att_layer w_q/w_k (dead), Maxpool

    return None


def convert_lgca_state_dict(state_dict: Dict[str, Any]):
    """LGCANet_V3 torch state_dict → flax {'params','batch_stats'} tree.

    Covers the full reference model (lgca_net_v3.py:579-658): 3D FeatureNet
    (OIDHW → DHWIO conv transpose), fused 2D U_Net / AttU_Net, multi-head
    slice attention, dsv head. Dead submodules are reported in
    ``_unmatched_keys`` (forw4, attention w_q/w_k).
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    unmatched = []
    for key, val in state_dict.items():
        arr = np.asarray(getattr(val, "numpy", lambda: val)())
        mapped = _lgca_module_path(key)
        if mapped is None:
            unmatched.append(key)
            continue
        path, kind = mapped
        tail = key.split(".")[-1]
        if kind == "conv2d":
            if tail == "weight":
                _set_nested(params, path + ("kernel",), np.transpose(arr, (2, 3, 1, 0)))
            else:
                _set_nested(params, path + ("bias",), arr)
        elif kind == "conv3d":
            if tail == "weight":
                _set_nested(params, path + ("kernel",),
                            np.transpose(arr, (2, 3, 4, 1, 0)))
            else:
                _set_nested(params, path + ("bias",), arr)
        elif kind == "bn":
            if tail == "weight":
                _set_nested(params, path + ("scale",), arr)
            elif tail == "bias":
                _set_nested(params, path + ("bias",), arr)
            elif tail == "running_mean":
                _set_nested(stats, path + ("mean",), arr)
            elif tail == "running_var":
                _set_nested(stats, path + ("var",), arr)
            else:
                unmatched.append(key)
    return {"params": params, "batch_stats": stats, "_unmatched_keys": unmatched}


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a torch .pth checkpoint ({'epoch','state_dict','optimizer'})."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "state_dict" in raw:
        return {"epoch": raw.get("epoch", 0), "state_dict": raw["state_dict"]}
    return {"epoch": 0, "state_dict": raw}


def convert_torchvision_vgg16(state_dict: Dict[str, Any]):
    """torchvision VGG16 'features.N.weight' → our VGG stage conv params.

    Replicates the reference's positional 26-tensor partial load
    (net/vgg.py:65-74): the first 13 conv (weight, bias) pairs map onto our
    stages in order.
    """
    convs = []
    for k in sorted(state_dict.keys(), key=lambda s: int(s.split(".")[1])
                    if s.startswith("features.") else 10 ** 6):
        if k.startswith("features.") and k.endswith(".weight"):
            kb = k[:-len(".weight")] + ".bias"
            if kb in state_dict:
                convs.append((state_dict[k], state_dict[kb]))
    targets = [("stage1", 2), ("stage2", 2), ("stage3", 3), ("stage4", 3), ("stage5", 3)]
    params: Dict[str, Any] = {}
    i = 0
    for stage, n in targets:
        for c in range(1, n + 1):
            if i >= len(convs):
                break
            w, b = convs[i]
            w = np.asarray(getattr(w, "numpy", lambda: w)())
            b = np.asarray(getattr(b, "numpy", lambda: b)())
            _set_nested(params, ("encoder", f"{stage}_conv{c}", "conv", "kernel"),
                        np.transpose(w, (2, 3, 1, 0)))
            _set_nested(params, ("encoder", f"{stage}_conv{c}", "conv", "bias"), b)
            i += 1
    return {"params": params}
