"""Golden LGCANet_V3 parity vs the ACTUAL reference implementation.

Runs the reference torch model (net/lgca_net_v3.py:579-658) on CPU with its
state_dict converted through train/convert.convert_lgca_state_dict, and
asserts the rebuild matches end to end: seg_2d logits, dsv head, and the
loss values.

Reference quirks handled here:
  * ``data_parallel`` + ``feat.expand(torch.cuda.device_count(), ...)``
    (lgca_net_v3.py:600,614-615,622) break on CPU (device_count()==0 expands
    to EMPTY tensors) — patched to direct calls / count 1.
  * ``net_UNet: AttU_Net`` CRASHES in the reference: LGCANet_V3.__init__
    passes ``feature_scale=`` (lgca_net_v3.py:588) which AttU_Net.__init__
    does not accept (:479). AttU_Net golden parity therefore runs against the
    bare fused-unet module (our ``attention_gates=True`` variant).
  * ``forw4`` and the attention ``w_q``/``w_k`` linears exist in the
    state_dict but are dead in forward — the converter reports them
    unmatched, and nothing else.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from rpnet_tpu.models.lgca import FusedUNet, LGCANetV3
from rpnet_tpu.train.checkpoint import overlay
from rpnet_tpu.train.convert import convert_lgca_state_dict

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref_lgca():
    # reuse the stub environment set up by test_golden_parity's fixture logic
    from tests.test_golden_parity import _stub_module

    # install the FUNCTIONAL torchvision stand-ins (test ordering must not
    # matter: test_golden_parity's resnet tests need a working resnet18)
    from tests.test_golden_parity import _TVBasicBlock, _tv_resnet18
    if "torchvision" not in sys.modules:
        tv = _stub_module("torchvision")
        tv.models = _stub_module("torchvision.models", resnet18=_tv_resnet18)
        tv.models.resnet = _stub_module("torchvision.models.resnet",
                                        BasicBlock=_TVBasicBlock)
    for name in ("pydicom", "SimpleITK", "nrrd", "nibabel", "torchviz"):
        if name not in sys.modules:
            _stub_module(name, dcmread=None, read=None, write=None,
                         make_dot=None)
    if "skimage" not in sys.modules:
        sk = _stub_module("skimage")
        sk.measure = _stub_module("skimage.measure")
    if "sklearn" not in sys.modules:
        skl = _stub_module("sklearn")
        skl.metrics = _stub_module("sklearn.metrics", precision_score=None,
                                   recall_score=None)
    sys.modules.setdefault("dicom", sys.modules["pydicom"])
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import net.lgca_net_v3 as mod
    return mod


def _cfg(variant="U_Net"):
    return {"roi_names": ["liver", "spleen"], "net_UNet": variant,
            "unet_normalize_type": "BatchNorm2d", "final_activation": "sigmoid"}


def _patch_parallel(monkeypatch, mod):
    def fake_dp(module, inputs, **kw):
        if isinstance(inputs, tuple):
            return module(*inputs)
        return module(inputs)

    monkeypatch.setattr(mod, "data_parallel", fake_dp)
    monkeypatch.setattr(torch.cuda, "device_count", lambda: 1)


def _leaf_paths(t):
    return {jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_flatten_with_path(t)[0]}


D, HV, WV = 8, 32, 32      # volume (half slice resolution)
B, H, W = 2, 64, 64        # slices
K = 2


def _data(seed=0):
    rng = np.random.RandomState(seed)
    vol = rng.randn(1, 1, D, HV, WV).astype(np.float32) * 0.5
    slices = rng.randn(B, 1, H, W).astype(np.float32) * 0.5
    mask2d = (rng.rand(B, K, H, W) > 0.7).astype(np.float32)
    mask3d = (rng.rand(K, D, HV, WV) > 0.7).astype(np.float32)
    return vol, slices, mask2d, mask3d


def test_golden_lgca_full_model(ref_lgca, monkeypatch):
    """Full LGCANet_V3: converted weights, eval mode, seg_2d + dsv + loss."""
    _patch_parallel(monkeypatch, ref_lgca)
    torch.manual_seed(3)
    ref = ref_lgca.LGCANet_V3(_cfg("U_Net"), mode="train")

    vol, slices, mask2d, mask3d = _data()
    data = {"volume": torch.from_numpy(vol),
            "slice": torch.from_numpy(slices),
            "slice_num": torch.tensor([D]), "slice_weight": torch.ones(1)}
    # non-trivial BN running stats: a few train-mode passes
    ref.train()
    with torch.no_grad():
        for _ in range(3):
            ref(data)
    ref.eval()
    with torch.no_grad():
        out_ref = ref(data)
        target = {"mask": torch.from_numpy(mask2d),
                  "downsampled_volume_mask": torch.from_numpy(mask3d)}
        loss_ref = ref.loss(out_ref, target)

    model = LGCANetV3(output_ch=K)
    vol_j = jnp.asarray(np.transpose(vol, (0, 2, 3, 4, 1)))
    sli_j = jnp.asarray(np.transpose(slices, (0, 2, 3, 1)))
    variables = model.init(jax.random.PRNGKey(0), vol_j, sli_j, train=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)

    tree = convert_lgca_state_dict(ref.state_dict())
    assert _leaf_paths(tree["params"]) == _leaf_paths(variables["params"])
    assert _leaf_paths(tree["batch_stats"]) == _leaf_paths(variables["batch_stats"])
    for k in tree["_unmatched_keys"]:
        assert ("forw4" in k or ".w_q." in k or ".w_k." in k
                or k.endswith("num_batches_tracked")), f"unexpected unmatched {k}"

    merged = {"params": overlay(variables["params"], tree["params"]),
              "batch_stats": overlay(variables["batch_stats"], tree["batch_stats"])}
    out = model.apply(merged, vol_j, sli_j, train=False)

    seg_ref = np.transpose(out_ref["seg_2d"].numpy(), (0, 2, 3, 1))
    dsv_ref = np.transpose(out_ref["dsv"].numpy(), (0, 2, 3, 4, 1))
    np.testing.assert_allclose(np.asarray(out["seg_2d"]), seg_ref,
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["dsv"]), dsv_ref,
                               atol=2e-3, rtol=1e-3)

    target_j = {"mask": jnp.asarray(np.transpose(mask2d, (0, 2, 3, 1))),
                "downsampled_volume_mask":
                    jnp.asarray(np.transpose(mask3d, (1, 2, 3, 0)))}
    loss = LGCANetV3.loss(out, target_j)
    for i in range(K):
        np.testing.assert_allclose(float(loss["unet_dice"][i]),
                                   float(loss_ref["unet_dice"][i]), atol=2e-4)
        np.testing.assert_allclose(float(loss["loss_dice"][i]),
                                   float(loss_ref["loss_dice"][i]), atol=5e-4)


def test_golden_lgca_attunet_variant(ref_lgca, monkeypatch):
    """AttU_Net fused unet (bare module — unreachable via the reference's
    LGCANet_V3, see module docstring) vs attention_gates=True."""
    _patch_parallel(monkeypatch, ref_lgca)
    torch.manual_seed(5)
    ref = ref_lgca.AttU_Net(_cfg("AttU_Net"), img_ch=1, output_ch=K)

    rng = np.random.RandomState(1)
    slices = rng.randn(B, 1, H, W).astype(np.float32) * 0.5
    p_ch = (24, 32, 64, 64)
    depths = (D, D // 2, D // 4, D // 8)
    res = (H // 2, H // 4, H // 8, H // 16)
    feats_t = {}
    for i, (c, d, r) in enumerate(zip(p_ch, depths, res), start=1):
        feats_t[f"d{i}"] = torch.from_numpy(
            rng.randn(1, c, d, r, r).astype(np.float32) * 0.5)
    glob = rng.randn(1, 64).astype(np.float32)
    feats_t["glob_feat"] = (torch.from_numpy(glob)
                            .view(1, 64, 1, 1).expand(B, -1, H, W))

    x_t = torch.from_numpy(slices)
    ref.train()
    with torch.no_grad():
        for _ in range(3):
            ref(x_t, feats_t)
    ref.eval()
    with torch.no_grad():
        out_ref = ref(x_t, feats_t)["seg_2d"]

    model = FusedUNet(output_ch=K, attention_gates=True)
    sli_j = jnp.asarray(np.transpose(slices, (0, 2, 3, 1)))
    feats_j = {k: jnp.asarray(np.transpose(v.numpy(), (0, 2, 3, 4, 1)))
               for k, v in feats_t.items() if k != "glob_feat"}
    feats_j["glob_feat"] = jnp.asarray(
        np.transpose(feats_t["glob_feat"].numpy(), (0, 2, 3, 1)))
    variables = model.init(jax.random.PRNGKey(0), sli_j, feats_j, train=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)

    sd = {f"unet.{k}": v for k, v in ref.state_dict().items()}
    tree = convert_lgca_state_dict(sd)
    assert _leaf_paths(tree["params"]["unet"]) == _leaf_paths(variables["params"])
    merged = {"params": overlay(variables["params"], tree["params"]["unet"]),
              "batch_stats": overlay(variables["batch_stats"],
                                     tree["batch_stats"]["unet"])}
    out = model.apply(merged, sli_j, feats_j, train=False)["seg_2d"]
    np.testing.assert_allclose(np.asarray(out),
                               np.transpose(out_ref.numpy(), (0, 2, 3, 1)),
                               atol=2e-3, rtol=1e-3)
