"""Golden loss parity vs the ACTUAL reference loss functions.

The loss zoo was value-tested against torch oracles re-derived inside the
test files; here the reference implementations themselves (net/rp_net.py,
net/unet.py) run on the same inputs. Covers every member of LOSS_REGISTRY.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from rpnet_tpu.models import losses as L

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref_losses():
    from tests.test_golden_parity import _stub_module  # reuse stubs

    for name in ("pydicom", "SimpleITK", "nrrd", "nibabel", "torchviz"):
        if name not in sys.modules:
            _stub_module(name, dcmread=None, read=None, write=None,
                         make_dot=None)
    # install the FUNCTIONAL torchvision stand-ins (test ordering must not
    # matter: test_golden_parity's resnet tests need a working resnet18)
    from tests.test_golden_parity import _TVBasicBlock, _tv_resnet18
    if "torchvision" not in sys.modules:
        tv = _stub_module("torchvision")
        tv.models = _stub_module("torchvision.models", resnet18=_tv_resnet18)
        tv.models.resnet = _stub_module("torchvision.models.resnet",
                                        BasicBlock=_TVBasicBlock)
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
    import net.rp_net as rp
    import net.unet as un
    return rp, un


def _data(rng, N=200, C=3):
    score = rng.randn(N, C).astype(np.float32)
    target = (rng.rand(N, C) > 0.6).astype(np.float32)
    target[:, C - 1] = 0.0           # one empty-GT class (the *0 branch)
    return score, target


def test_golden_dice_loss_per_class(ref_losses, rng):
    _, un = ref_losses
    score, target = _data(rng)
    ref = un.dice_loss(torch.from_numpy(score), torch.from_numpy(target))
    ours = np.asarray(L.dice_loss_per_class(jnp.asarray(score),
                                            jnp.asarray(target)))
    for i, r in enumerate(ref):
        np.testing.assert_allclose(ours[i], float(r), atol=1e-5)


def test_golden_binary_dice_loss(ref_losses, rng):
    _, un = ref_losses
    score, target = _data(rng)
    ref = un.binary_dice_loss(torch.from_numpy(score),
                              torch.from_numpy(target))
    ours = np.asarray(L.binary_dice_loss(jnp.asarray(score),
                                         jnp.asarray(target)))
    for i, r in enumerate(ref):
        np.testing.assert_allclose(ours[i], float(r), atol=1e-5)


def test_golden_dice_loss_bootstrap(ref_losses, rng):
    _, un = ref_losses
    score, target = _data(rng)
    ref = un.dice_loss_bootstrap(torch.from_numpy(score),
                                 torch.from_numpy(target))
    ours = np.asarray(L.dice_loss_bootstrap(jnp.asarray(score),
                                            jnp.asarray(target)))
    for i, r in enumerate(ref):
        np.testing.assert_allclose(ours[i], float(r), atol=1e-5)


def test_golden_dice_softmax_and_dice_ce(ref_losses, rng):
    rp, _ = ref_losses
    B, H, W = 2, 8, 8
    logits = rng.randn(B, 2, H, W).astype(np.float32)
    labels = (rng.rand(B, H, W) > 0.5).astype(np.int64)
    lt = torch.from_numpy(logits)
    tt = torch.from_numpy(labels)
    ref_dice = rp.dice_loss_softmax(lt, tt)
    ref_ce = rp.dice_ce(lt, tt)

    lj = jnp.asarray(np.transpose(logits, (0, 2, 3, 1)))
    tj = jnp.asarray(labels)
    ours_dice = L.dice_loss_softmax(lj, tj)
    ours_ce = L.dice_ce(lj, tj)
    np.testing.assert_allclose(float(ours_dice), float(ref_dice), atol=1e-5)
    np.testing.assert_allclose(float(ours_ce), float(ref_ce), atol=1e-5)


def test_golden_ghm_c_and_ghm_dice(ref_losses, rng, monkeypatch):
    # the reference GHM constructors hardcode .cuda() (net/unet.py:60)
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    _, un = ref_losses
    N = 400
    pred = rng.randn(N).astype(np.float32)
    target = (rng.rand(N) > 0.5).astype(np.float32)
    w = np.ones(N, np.float32)
    pt, tt, wt = map(torch.from_numpy, (pred, target, w))

    ref_c = un.GHMC(momentum=0.0)(pt, tt, wt)
    ours_c = L.ghm_c_loss(jnp.asarray(pred), jnp.asarray(target),
                          jnp.asarray(w))
    np.testing.assert_allclose(float(ours_c), float(ref_c), atol=1e-4,
                               rtol=1e-4)

    ref_d = un.GHMDice(momentum=0.0)(torch.sigmoid(pt), tt, wt)
    ours_d = L.ghm_dice_loss(jnp.asarray(1 / (1 + np.exp(-pred))),
                             jnp.asarray(target), jnp.asarray(w))
    np.testing.assert_allclose(float(ours_d), float(ref_d), atol=1e-4,
                               rtol=1e-4)
