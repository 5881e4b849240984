"""Model factory (rebuild of net/model.py:4-7): name → constructor.

Constructors take the flat config (Config or dict) and return an
un-initialized linen module configured like the reference's
``model_factory[net](pretrained_path=..., cfg=..., backbone_cfg=config)``
call site (test_rpnet.py:74-81).
"""

from __future__ import annotations

from typing import Any, Dict

from rpnet_tpu.models.rpnet import RPNet


def build_rpnet(config, align: bool = True, num_iter: int | None = None) -> RPNet:
    get = config.get if hasattr(config, "get") else config.__getitem__
    return RPNet(
        backbone=get("backbone", "vgg"),
        norm=get("unet_normalize_type", "BatchNorm2d"),
        mask_feature_map=get("mask_feature_map", "no"),
        scale=get("scale", 8 if get("backbone", "vgg") == "vgg" else 4),
        num_iter=num_iter if num_iter is not None else get("n_iter_refinement", 4),
        radius=get("mask_refinement_correlation_radius", 5),
        soft_mask=bool(get("soft_mask", False)),
        use_relation_enc=get("use_relation_enc", "relation"),
        align=align,
        use_pallas=bool(get("use_pallas", True)),
        refine_unroll=int(get("refinement_unroll", None) or 1),
    )


def build_lgcanet(config, align: bool = True, num_iter=None):
    """LGCANet_V3 from config (reference ctor: lgca_net_v3.py:580-590 —
    output channels = len(roi_names), 2D net chosen by `net_UNet`)."""
    from rpnet_tpu.models.lgca import LGCANetV3
    get = config.get if hasattr(config, "get") else config.__getitem__
    rois = get("roi_names", None) or ["roi"] * int(get("num_class", 6))
    return LGCANetV3(output_ch=len(rois),
                     norm=get("unet_normalize_type", "BatchNorm2d"),
                     feature_scale=float(get("feature_scale", 1.0)),
                     attention_gates=(get("net_UNet", "U_Net") == "AttU_Net"))


model_factory = {
    "RP_Net": build_rpnet,
    "LGCANet_V3": build_lgcanet,
}
