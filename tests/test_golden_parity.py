"""Golden full-model parity vs the ACTUAL reference implementation.

Round-1 parity tests checked ops against torch oracles re-derived inside the
test files; a shared misunderstanding could pass those. Here the reference
itself (/root/reference, torch CPU) is executed: RP_Net is built, its
state_dict converted through train/convert.py, and the rebuild must match
layer by layer and end to end on seeded synthetic episodes:

  * encoder d4 features        (net/unet.py:393-466, net/vgg.py:8-74)
  * CRE output                 (net/rp_net.py:45-84)
  * per-iteration refinement logits + final output (net/rp_net.py:226-350)
  * final Dice of the thresholded prediction

Reference quirks preserved/noted:
  * the vgg full-model path CRASHES in the reference — vgg Encoder.forward
    returns a raw tensor (net/vgg.py:36-37) but RP_Net indexes it with
    ['d4'] (net/rp_net.py:249). Full-model golden parity therefore runs on
    the UNet backbone; vgg gets encoder-level golden parity.
  * eval drives n_test_iter_refinement iterations (test_rpnet.py:51).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from rpnet_tpu.models.rpnet import RPNet
from rpnet_tpu.train.checkpoint import overlay
from rpnet_tpu.train.convert import convert_state_dict

REFERENCE = "/root/reference"


# ---------------------------------------------------------------- ref import

def _stub_module(name, **attrs):
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


class _TVBasicBlock(torch.nn.Module):
    """torchvision.models.resnet.BasicBlock stand-in (torchvision is absent
    from this image): same submodule names/shapes/forward, so the reference's
    own ResNet18 class (net/rp_net.py:19-42) builds and runs unmodified."""

    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 groups=1, base_width=64, dilation=1, norm_layer=None):
        super().__init__()
        nn = torch.nn
        norm_layer = norm_layer or nn.BatchNorm2d
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride=stride,
                               padding=1, bias=False)
        self.bn1 = norm_layer(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = norm_layer(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _TVResNet18(torch.nn.Module):
    """torchvision.models.resnet18() stand-in with the SAME children() order
    (conv1, bn1, relu, maxpool, layer1..layer4, avgpool, fc) — the reference
    slices `children()[:-5]`, so the prefix it keeps must match exactly."""

    def __init__(self):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)

        def layer(inp, planes, stride):
            down = None
            if stride != 1 or inp != planes:
                down = nn.Sequential(
                    nn.Conv2d(inp, planes, 1, stride=stride, bias=False),
                    nn.BatchNorm2d(planes))
            return nn.Sequential(_TVBasicBlock(inp, planes, stride, down),
                                 _TVBasicBlock(planes, planes))

        self.layer1 = layer(64, 64, 1)
        self.layer2 = layer(64, 128, 2)
        self.layer3 = layer(128, 256, 2)
        self.layer4 = layer(256, 512, 2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512, 1000)
        # torchvision ResNet.__init__ init loop
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.kaiming_normal_(m.weight, mode="fan_out",
                                        nonlinearity="relu")
            elif isinstance(m, nn.BatchNorm2d):
                nn.init.constant_(m.weight, 1)
                nn.init.constant_(m.bias, 0)


def _tv_resnet18(pretrained=False, **kw):
    assert not pretrained, "no torchvision weights in this image"
    return _TVResNet18()


@pytest.fixture(scope="module")
def ref_net():
    """Import the reference package with torchvision replaced by the
    functional stand-ins above (absent from the image) — all THREE reference
    backbones then build and run, resnet included."""
    if "torchvision" not in sys.modules:
        tv = _stub_module("torchvision")
        tv.models = _stub_module("torchvision.models", resnet18=_tv_resnet18)
        tv.models.resnet = _stub_module("torchvision.models.resnet",
                                        BasicBlock=_TVBasicBlock)
    # utils/util.py (imported transitively by net/unet.py) pulls viz/IO deps
    # the image lacks; none are touched by the model forward paths under test
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
    import net.rp_net as ref_rp_net
    import net.vgg as ref_vgg
    return ref_rp_net, ref_vgg


# ------------------------------------------------------------------- helpers

def _backbone_cfg(backbone, n_iter, radius):
    return {
        "scale": 8 if backbone == "vgg" else 4,
        "n_iter_refinement": n_iter,
        "use_relation_enc": "relation",
        "soft_mask": False,
        "mask_refinement_correlation_radius": radius,
        "unet_normalize_type": "BatchNorm2d",
        "mask_feature_map": "no",
        "final_activation": "sigmoid",
    }


def _episode(B=2, H=64, W=64, seed=0):
    """Seeded synthetic episode: misaligned soft ellipses + noise."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[:H, :W].astype(np.float32)

    def organ(cy, cx, ry, rx):
        d = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2
        return (d < 1).astype(np.float32), np.exp(-d).astype(np.float32)

    supp_img, qry_img = np.zeros((B, H, W), np.float32), np.zeros((B, H, W), np.float32)
    fore = np.zeros((B, H, W), np.float32)
    qry_lab = np.zeros((B, H, W), np.float32)
    appr = np.zeros((B, H, W), np.float32)
    for b in range(B):
        m_s, i_s = organ(H / 2 + 4 * b, W / 2 - 3, H / 4, W / 5)
        m_q, i_q = organ(H / 2 - 2 * b, W / 2 + 4, H / 4, W / 5)
        m_a, _ = organ(H / 2 - 2 * b + 2, W / 2 + 2, H / 4, W / 5)
        supp_img[b] = i_s + rng.randn(H, W).astype(np.float32) * 0.05
        qry_img[b] = i_q + rng.randn(H, W).astype(np.float32) * 0.05
        fore[b], qry_lab[b], appr[b] = m_s, m_q, m_a
    return supp_img, fore, qry_img, qry_lab, appr


def _build_pair(ref_net, backbone, n_iter, radius, B, H, W, seed=1):
    """Reference torch model (non-trivial BN stats) + converted flax twin."""
    ref_rp_net, _ = ref_net
    torch.manual_seed(seed)
    bcfg = _backbone_cfg(backbone, n_iter, radius)
    # vgg expects 3-channel input (the forward expands 1→3, rp_net.py:247);
    # UNet takes the raw 1-channel slice (img_ch=1 default, unet.py:394)
    ref = ref_rp_net.RP_Net(in_channels=3 if backbone == "vgg" else 1,
                            pretrained_path=None,
                            cfg={"align": False, "backbone": backbone},
                            backbone_cfg=bcfg)
    # make BN running stats non-trivial: a few train-mode encoder passes
    ref.train()
    with torch.no_grad():
        for s in range(3):
            x = torch.randn(2, 1, H, W) * 0.5 + 0.1 * s
            if backbone == "vgg":
                ref.encoder(x.expand(-1, 3, -1, -1))
            elif backbone == "resnet":
                ref.encoder(x.expand(-1, 3, -1, -1), None)
            else:
                c = ref.encoder(x, None)
            if backbone == "UNet":
                d4 = c["d4"]
                m = torch.nn.functional.avg_pool2d(
                    (torch.rand(2, 1, H, W) > 0.5).float(), bcfg["scale"])
                ref.cre(d4 * m, d4 * (1 - m))
    ref.eval()

    model = RPNet(backbone=backbone, norm="BatchNorm2d", mask_feature_map="no",
                  scale=bcfg["scale"], num_iter=n_iter, radius=radius,
                  soft_mask=False, use_relation_enc="relation", align=False,
                  use_pallas=False)
    dummy = (jnp.zeros((1, 1, B, H, W, 1)), jnp.zeros((1, 1, B, H, W)),
             jnp.ones((1, 1, B, H, W)), jnp.zeros((B, H, W, 1)),
             jnp.zeros((B, H, W)))
    variables = model.init(jax.random.PRNGKey(0), *dummy, train=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)

    tree = convert_state_dict(ref.state_dict())
    # conversion must cover EVERY param leaf of the rebuild — no silent
    # partial conversion (the known-dead cre.w_context/cre.out are the only
    # expected unmatched keys besides num_batches_tracked)
    def leaf_paths(t):
        return {jax.tree_util.keystr(p)
                for p, _ in jax.tree_util.tree_flatten_with_path(t)[0]}
    assert leaf_paths(tree["params"]) == leaf_paths(variables["params"])
    assert leaf_paths(tree["batch_stats"]) == leaf_paths(variables["batch_stats"])
    for k in tree["_unmatched_keys"]:
        assert k.startswith(("cre.w_context.", "cre.out.")) \
            or k.endswith("num_batches_tracked"), f"unexpected unmatched {k}"

    merged = {"params": overlay(variables["params"], tree["params"]),
              "batch_stats": overlay(variables["batch_stats"], tree["batch_stats"])}
    return ref, model, merged, bcfg


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


# --------------------------------------------------------------------- tests

@pytest.mark.parametrize("backbone", ["UNet", "vgg", "resnet"])
def test_golden_encoder_features(ref_net, backbone):
    """Converted-weights encoder d4 must match the reference encoder."""
    B, H, W = 2, 64, 64
    ref, model, merged, bcfg = _build_pair(ref_net, backbone, 1, 2, B, H, W)
    supp_img, fore, *_ = _episode(B, H, W)

    x = torch.from_numpy(supp_img)[:, None]
    with torch.no_grad():
        if backbone == "vgg":
            d4_t = ref.encoder(x.expand(-1, 3, -1, -1)).numpy()
            d4_t = np.transpose(d4_t, (0, 2, 3, 1))
        elif backbone == "resnet":
            d4_t = _nhwc(ref.encoder(x.expand(-1, 3, -1, -1), None)["d4"])
        else:
            d4_t = _nhwc(ref.encoder(x, None)["d4"])

    def enc(m, imgs, mask):
        return m._encode(imgs, mask, False)

    d4_j = np.asarray(model.apply(
        merged, jnp.asarray(supp_img)[..., None], jnp.asarray(fore), method=enc))
    assert d4_j.shape == d4_t.shape
    np.testing.assert_allclose(d4_j, d4_t, atol=2e-4,
                               err_msg=f"{backbone} encoder drift")


def test_golden_cre_output(ref_net):
    """CRE (w_k/w_q + correlation + fused 1×1) vs the reference CRE on the
    SAME input features — isolates the relation encoder."""
    B, H, W, radius = 2, 64, 64, 2
    ref, model, merged, bcfg = _build_pair(ref_net, "UNet", 1, radius, B, H, W)
    supp_img, fore, *_ = _episode(B, H, W)

    x = torch.from_numpy(supp_img)[:, None]
    with torch.no_grad():
        d4 = ref.encoder(x, None)["d4"]
        m = torch.nn.functional.avg_pool2d(
            torch.from_numpy(fore)[:, None], bcfg["scale"])
        cre_t = _nhwc(ref.cre(d4 * m, d4 * (1 - m)))

    def cre(mdl, a, b):
        return mdl.cre(a, b, False)

    d4_j = jnp.asarray(_nhwc(d4))
    m_j = jnp.asarray(np.transpose(m.numpy(), (0, 2, 3, 1)))
    cre_j = np.asarray(model.apply(merged, d4_j * m_j, d4_j * (1 - m_j),
                                   method=cre))
    assert cre_j.shape == cre_t.shape
    np.testing.assert_allclose(cre_j, cre_t, atol=5e-4, err_msg="CRE drift")


@pytest.mark.parametrize("backbone", ["UNet", "resnet", "vgg"])
def test_golden_full_forward(ref_net, backbone):
    """END-TO-END: per-iteration refinement logits, final output, and Dice
    must match the reference forward (net/rp_net.py:226-350) bit-closely.

    All THREE backbones. The reference's vgg full-model path crashes AS
    SHIPPED on its own indexing defect — vgg Encoder.forward returns a raw
    tensor (net/vgg.py:36-37) while RP_Net.forward indexes it with ['d4']
    (net/rp_net.py:249,258). For the vgg row ONLY that indexing is patched
    in-test (the instance forward is wrapped to return {'d4': tensor}; no
    weights, shapes, or math are touched), which is the minimal reading of
    the reference's intent — every other backbone wraps its output in a
    dict keyed 'd4' (net/unet.py:465, net/rp_net.py:40-42)."""
    B, H, W, n_iter, radius = 2, 64, 64, 3, 2
    ref, model, merged, bcfg = _build_pair(ref_net, backbone, n_iter, radius, B, H, W)
    if backbone == "vgg":
        enc_fwd = ref.encoder.forward
        ref.encoder.forward = lambda x, mask=None: {"d4": enc_fwd(x, mask)}
    supp_img, fore, qry_img, qry_lab, appr = _episode(B, H, W)
    back = 1.0 - fore

    s_t = torch.from_numpy(supp_img)[:, None]
    q_t = torch.from_numpy(qry_img)[:, None]
    with torch.no_grad():
        out_t = ref([[s_t]], [[torch.from_numpy(fore)]],
                    [[torch.from_numpy(back)]], [q_t],
                    appr_query_labels=torch.from_numpy(appr))

    out_j = model.apply(
        merged,
        jnp.asarray(supp_img)[None, None, ..., None],
        jnp.asarray(fore)[None, None], jnp.asarray(back)[None, None],
        jnp.asarray(qry_img)[..., None], jnp.asarray(appr), train=False)

    # per-iteration refinement logits (threshold feedback included: any
    # drifted mask pixel would compound across iterations and blow past atol)
    for i in range(n_iter):
        ref_t = _nhwc(out_t["refinement"][i])          # (B, H, W, 2)
        ref_j = np.asarray(out_j["refinement"][i])
        np.testing.assert_allclose(ref_j, ref_t, atol=2e-3,
                                   err_msg=f"refinement iter {i} drift")

    final_t = _nhwc(out_t["output"])
    final_j = np.asarray(out_j["output"])
    np.testing.assert_allclose(final_j, final_t, atol=2e-3,
                               err_msg="final output drift")

    # end-to-end Dice of the thresholded prediction
    def dice(pred, gt):
        p = pred > 0.5
        g = gt > 0.5
        return 2.0 * (p & g).sum() / max(p.sum() + g.sum(), 1)

    pred_t = torch.softmax(out_t["output"], dim=1)[:, 1].numpy()
    pred_j = np.asarray(jax.nn.softmax(out_j["output"], axis=-1)[..., 1])
    # the comparison must not be vacuous: the (random-weight) reference net
    # still predicts a non-trivial foreground region on this episode
    fg_frac = np.mean(pred_t > 0.5)
    assert 0.005 < fg_frac < 0.995, f"degenerate prediction ({fg_frac})"
    assert abs(dice(pred_j, qry_lab) - dice(pred_t, qry_lab)) < 1e-3
    # and the binary masks agree almost everywhere
    agree = np.mean((pred_j > 0.5) == (pred_t > 0.5))
    assert agree > 0.999, f"mask agreement {agree}"


def test_golden_forward_5shot_multiway_reduction(ref_net):
    """The rebuild's multi-shot CRE generalization must REDUCE to the
    reference exactly at 1-way/1-shot (the only case the reference runs —
    it crashes for n_shot>1, net/rp_net.py:275)."""
    B, H, W = 1, 32, 32
    ref, model, merged, _ = _build_pair(ref_net, "UNet", 2, 1, B, H, W)
    supp_img, fore, qry_img, _, appr = _episode(B, H, W, seed=3)
    back = 1.0 - fore

    with torch.no_grad():
        out_t = ref([[torch.from_numpy(supp_img)[:, None]]],
                    [[torch.from_numpy(fore)]], [[torch.from_numpy(back)]],
                    [torch.from_numpy(qry_img)[:, None]],
                    appr_query_labels=torch.from_numpy(appr))
    out_j = model.apply(
        merged, jnp.asarray(supp_img)[None, None, ..., None],
        jnp.asarray(fore)[None, None], jnp.asarray(back)[None, None],
        jnp.asarray(qry_img)[..., None], jnp.asarray(appr), train=False)
    np.testing.assert_allclose(np.asarray(out_j["output"]),
                               _nhwc(out_t["output"]), atol=2e-3)


def test_golden_ghm_momentum_ema(ref_net, monkeypatch):
    """GHM losses with momentum>0 carry EMA bin counts; values must track the
    ACTUAL reference GHMC/GHMDice across sequential calls (net/unet.py:39-188).
    The reference hardcodes .cuda() — patched to a no-op for CPU."""
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    import net.unet as ref_unet

    from rpnet_tpu.models.losses import ghm_c_loss, ghm_dice_loss

    rng = np.random.RandomState(0)
    mmt, bins = 0.3, 10

    ghmc_t = ref_unet.GHMC(bins=bins, momentum=mmt)
    ghmd_t = ref_unet.GHMDice(bins=bins, momentum=mmt)
    acc_c = acc_d = None
    for step in range(4):
        logits = rng.randn(400).astype(np.float32) * (1 + step)
        target = (rng.rand(400) > 0.6).astype(np.float32)
        weight = (rng.rand(400) > 0.1).astype(np.float32)  # some ignored

        lt = ghmc_t(torch.from_numpy(logits), torch.from_numpy(target),
                    torch.from_numpy(weight)).item()
        lj, acc_c = ghm_c_loss(jnp.asarray(logits), jnp.asarray(target),
                               jnp.asarray(weight), bins=bins,
                               momentum=mmt, acc_sum=acc_c)
        np.testing.assert_allclose(float(lj), lt, rtol=1e-5,
                                   err_msg=f"GHMC step {step}")
        np.testing.assert_allclose(np.asarray(acc_c),
                                   ghmc_t.acc_sum.numpy(), rtol=1e-5)

        probs = 1 / (1 + np.exp(-logits))
        dt = ghmd_t(torch.from_numpy(probs), torch.from_numpy(target),
                    torch.from_numpy(weight)).item()
        dj, acc_d = ghm_dice_loss(jnp.asarray(probs), jnp.asarray(target),
                                  jnp.asarray(weight), bins=bins,
                                  momentum=mmt, acc_sum=acc_d)
        np.testing.assert_allclose(float(dj), dt, rtol=1e-5,
                                   err_msg=f"GHMDice step {step}")


# ------------------------------------------------ registration golden parity

@pytest.fixture(scope="module")
def ref_reg(ref_net):
    """The ACTUAL reference registration module (net/registration.py)."""
    import net.registration as ref_registration
    return ref_registration


def _reg_pair(H=32, W=32, seed=3):
    """Smooth misaligned pair: gaussian-bump 'organs' + mild noise."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[:H, :W].astype(np.float32)

    def bump(cy, cx, ry, rx):
        return np.exp(-(((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2))

    moving = bump(H / 2 + 3, W / 2 - 2, H / 4, W / 5) + \
        rng.randn(H, W).astype(np.float32) * 0.02
    fixed = bump(H / 2 - 1, W / 2 + 2, H / 4, W / 5) + \
        rng.randn(H, W).astype(np.float32) * 0.02
    return moving.astype(np.float32), fixed.astype(np.float32)


def test_golden_affine_fit_trajectory(ref_reg):
    """fit_affine reproduces AffineRegistration.train_registraion
    (net/registration.py:316-357): theta AND warped image after N Adam steps."""
    from rpnet_tpu.registration.affine import affine_warp, fit_affine

    H = W = 32
    iters = 8
    moving, fixed = _reg_pair(H, W)
    t_m = torch.tensor(moving[None, None])
    t_f = torch.tensor(fixed[None, None])
    reg = ref_reg.AffineRegistration((H, W))
    opt = torch.optim.Adam(reg.parameters(), lr=0.01)
    reg.train_registraion(t_m, t_f, opt, loss_fn=ref_reg.MSE, iters=iters)
    theta_ref = reg.theta.detach().numpy()[0]
    with torch.no_grad():
        warped_ref = reg(t_m).numpy()[0, 0]

    theta, losses = fit_affine(jnp.asarray(moving[..., None]),
                               jnp.asarray(fixed[..., None]),
                               iters=iters, sampler="gather")
    np.testing.assert_allclose(np.asarray(theta), theta_ref, atol=5e-5,
                               err_msg="theta trajectory drift vs reference")
    warped = affine_warp(jnp.asarray(moving[..., None]), theta,
                         sampler="gather")[..., 0]
    np.testing.assert_allclose(np.asarray(warped), warped_ref, atol=5e-5)
    assert losses.shape == (iters,)


def test_golden_demons_fit_trajectory(ref_reg):
    """fit_demons reproduces DemonsRegistration.train_registraion with the
    diffeomorphic integrator and GaussianRegulariser post-step smoothing
    (net/registration.py:225-312, few_shot_reader.py:148-162 settings)."""
    from rpnet_tpu.registration.demons import demons_warp, fit_demons
    from rpnet_tpu.ops.sampling import compute_grid

    H = W = 32
    iters = 5
    moving, fixed = _reg_pair(H, W, seed=5)
    t_m = torch.tensor(moving[None, None])
    t_f = torch.tensor(fixed[None, None])
    demons = ref_reg.DemonsRegistration((H, W), use_diffeomorphic=True)
    opt = torch.optim.Adam(demons.parameters(), lr=0.01)
    regulariser = ref_reg.GaussianRegulariser([1, 1], sigma=[2, 2],
                                              dtype=torch.float32, device="cpu")
    demons.train_registraion(t_m, t_f, opt, loss_fn=ref_reg.NCC,
                             regulariser=regulariser, iters=iters)
    flow_ref = demons.flow.detach().numpy()[0]          # (2, H, W)
    with torch.no_grad():
        warped_ref = demons(t_m, ref_reg.compute_grid((H, W))).numpy()[0, 0]

    flow, losses = fit_demons(jnp.asarray(moving[..., None]),
                              jnp.asarray(fixed[..., None]),
                              iters=iters, sigma=(2.0, 2.0),
                              diffeomorphic=True)
    np.testing.assert_allclose(np.asarray(flow), flow_ref, atol=1e-4,
                               err_msg="demons flow trajectory drift")
    grid_chw = compute_grid((H, W))[0]
    warped = demons_warp(jnp.asarray(moving[..., None]), flow, grid_chw)[..., 0]
    np.testing.assert_allclose(np.asarray(warped), warped_ref, atol=1e-4)
    assert losses.shape == (iters,)


def test_golden_deeds_single_shot(ref_reg):
    """deeds_fit reproduces DEEDSRegistration.train_registraion's sample grid
    and warped output (net/registration.py:360-471)."""
    from rpnet_tpu.registration.deeds import deeds_fit, deeds_warp

    H = W = 32
    moving, fixed = _reg_pair(H, W, seed=7)
    t_m = torch.tensor(moving[None, None])
    t_f = torch.tensor(fixed[None, None])
    deeds = ref_reg.DEEDSRegistration(grid_size=32, displacement_width=15)
    with torch.no_grad():
        deeds.train_registraion(t_m, t_f)
        grid_ref = deeds.sample_grid.numpy()[0]          # (H, W, 2)
        warped_ref = deeds(t_m).numpy()[0, 0]

    grid = deeds_fit(jnp.asarray(moving[..., None]),
                     jnp.asarray(fixed[..., None]), grid_size=32)
    np.testing.assert_allclose(np.asarray(grid), grid_ref, atol=1e-4,
                               err_msg="DEEDS sample grid drift")
    warped = deeds_warp(jnp.asarray(moving[..., None]), grid)[..., 0]
    np.testing.assert_allclose(np.asarray(warped), warped_ref, atol=1e-4)


def test_golden_forward_two_way_replication(ref_net):
    """n_way>1 CRASHES the reference: the relation-mode CRE reduces supp_fts
    to way0/shot0 (net/rp_net.py:275, [None, None] re-expansion to (1,1,...))
    and the prototype loop then indexes way 1 → IndexError (:288). The
    reader replicates supports across ways (few_shot_reader.py:294-298), so
    the sensible lift — what the pipeline's n_way knob does — runs the
    replicated ways through the full way axis: per-way prototypes, softmax
    over 1+n_way channels, identical logits across the duplicated ways."""
    B, H, W = 1, 32, 32
    ref, model, merged, _ = _build_pair(ref_net, "UNet", 2, 1, B, H, W, seed=7)
    supp_img, fore, qry_img, _, appr = _episode(B, H, W, seed=4)
    back = 1.0 - fore

    st = torch.from_numpy(supp_img)[:, None]
    ft = torch.from_numpy(fore)
    bt = torch.from_numpy(back)
    with torch.no_grad(), pytest.raises(IndexError):
        ref([[st], [st]], [[ft], [ft]], [[bt], [bt]],
            [torch.from_numpy(qry_img)[:, None]],
            appr_query_labels=torch.from_numpy(appr))

    sj = jnp.tile(jnp.asarray(supp_img)[None, None, ..., None], (2, 1, 1, 1, 1, 1))
    fj = jnp.tile(jnp.asarray(fore)[None, None], (2, 1, 1, 1, 1))
    bj = jnp.tile(jnp.asarray(back)[None, None], (2, 1, 1, 1, 1))
    out_j = model.apply(merged, sj, fj, bj,
                        jnp.asarray(qry_img)[..., None], jnp.asarray(appr),
                        train=False)
    out = np.asarray(out_j["output"])
    assert out.shape[-1] == 3                      # 1 + n_way channels
    # duplicated ways must produce identical fg logits at every pixel
    np.testing.assert_allclose(out[..., 1], out[..., 2], atol=1e-5)
    # (note: channels (0,1) do NOT equal the 1-way logits — the softmax over
    # 1+n_way channels changes the thresholded mask inside the refinement
    # recurrence, so the trajectories legitimately diverge)
    assert np.all(np.isfinite(out))
