"""Checkpoint conversion tests: torch state_dict naming → flax variable tree."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rpnet_tpu.models.rpnet import RPNet
from rpnet_tpu.train.checkpoint import overlay, restore_into
from rpnet_tpu.train.convert import convert_state_dict, convert_torchvision_vgg16


def _init_unet_model():
    model = RPNet(backbone="UNet", scale=4, num_iter=1, radius=1)
    H = W = 32
    dummy = (jnp.zeros((1, 1, 1, H, W, 1)), jnp.zeros((1, 1, 1, H, W)),
             jnp.ones((1, 1, 1, H, W)), jnp.zeros((1, H, W, 1)),
             jnp.zeros((1, H, W)))
    variables = model.init(jax.random.PRNGKey(0), *dummy, train=False)
    return model, jax.tree_util.tree_map(np.asarray, variables)


def test_convert_unet_and_cre_keys(rng):
    model, variables = _init_unet_model()
    p = variables["params"]

    def fake(shape):
        return rng.randn(*shape).astype(np.float32)

    k1 = p["encoder"]["enc1"]["conv1"]["conv"]["kernel"]   # (3,3,1,64) HWIO
    up5k = p["encoder"]["up5"]["conv"]["conv"]["kernel"]
    qk_corr = p["cre"]["q_conv_corr"]["conv"]["kernel"]    # (1,1,d²,64)
    qk_fm = p["cre"]["q_conv_fm"]["conv"]["kernel"]        # (1,1,C,64)
    d2, Cc = qk_corr.shape[2], qk_fm.shape[2]
    sd = {
        "encoder.Conv1.conv.0.weight": fake((k1.shape[3], k1.shape[2], 3, 3)),
        "encoder.Conv1.conv.0.bias": fake((64,)),
        "encoder.Conv1.conv.1.weight": fake((64,)),
        "encoder.Conv1.conv.1.bias": fake((64,)),
        "encoder.Conv1.conv.1.running_mean": fake((64,)),
        "encoder.Conv1.conv.1.running_var": np.abs(fake((64,))),
        "encoder.Conv1.conv.1.num_batches_tracked": np.array(7),
        "encoder.Up5.up.1.weight": fake((up5k.shape[3], up5k.shape[2], 3, 3)),
        "encoder.Up5.up.1.bias": fake((512,)),
        "encoder.Up5.up.2.weight": fake((512,)),
        "encoder.Up5.up.2.bias": fake((512,)),
        "encoder.Up5.up.2.running_mean": fake((512,)),
        "encoder.Up5.up.2.running_var": np.abs(fake((512,))),
        "cre.w_k.0.weight": fake((Cc, Cc, 3, 3)),
        "cre.w_k.0.bias": fake((Cc,)),
        "cre.q.0.weight": fake((64, d2 + Cc, 1, 1)),
        "cre.q.0.bias": fake((64,)),
        "cre.w_context.0.weight": fake((1, 1, 1, 1)),   # dead submodule → skipped
    }
    tree = convert_state_dict(sd)
    assert "cre.w_context.0.weight" in tree["_unmatched_keys"]

    # conv kernel transposed OIHW → HWIO, placed at the right leaf
    np.testing.assert_allclose(
        tree["params"]["encoder"]["enc1"]["conv1"]["conv"]["kernel"],
        np.transpose(sd["encoder.Conv1.conv.0.weight"], (2, 3, 1, 0)))
    np.testing.assert_allclose(
        tree["batch_stats"]["encoder"]["enc1"]["norm1"]["bn"]["mean"],
        sd["encoder.Conv1.conv.1.running_mean"])
    # the fused q conv splits by linearity: corr channels first, fm1 after
    np.testing.assert_allclose(
        tree["params"]["cre"]["q_conv_corr"]["conv"]["kernel"],
        np.transpose(sd["cre.q.0.weight"][:, :d2], (2, 3, 1, 0)))
    np.testing.assert_allclose(
        tree["params"]["cre"]["q_conv_fm"]["conv"]["kernel"],
        np.transpose(sd["cre.q.0.weight"][:, d2:], (2, 3, 1, 0)))
    np.testing.assert_allclose(
        tree["params"]["cre"]["q_conv_fm"]["conv"]["bias"], sd["cre.q.0.bias"])

    # overlay into fresh variables keeps untouched leaves and swaps converted
    merged = overlay(variables, {k: v for k, v in tree.items()
                                 if not k.startswith("_")})
    np.testing.assert_allclose(
        merged["params"]["encoder"]["enc1"]["conv1"]["conv"]["kernel"],
        np.transpose(sd["encoder.Conv1.conv.0.weight"], (2, 3, 1, 0)))
    np.testing.assert_allclose(
        merged["params"]["encoder"]["enc2"]["conv1"]["conv"]["kernel"],
        p["encoder"]["enc2"]["conv1"]["conv"]["kernel"])


def test_overlay_shape_mismatch_raises(rng):
    _, variables = _init_unet_model()
    bad = {"params": {"encoder": {"enc1": {"conv1": {"conv": {
        "kernel": rng.randn(3, 3, 2, 64).astype(np.float32)}}}}}}
    with pytest.raises(ValueError, match="shape mismatch"):
        overlay(variables, bad)


def test_torchvision_vgg16_positional_load(rng):
    """First 13 (weight, bias) conv pairs map onto stages in order
    (net/vgg.py:65-74 positional semantics)."""
    chans = [(3, 64), (64, 64), (64, 128), (128, 128),
             (128, 256), (256, 256), (256, 256),
             (256, 512), (512, 512), (512, 512),
             (512, 512), (512, 512), (512, 512)]
    idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    sd = {}
    for (ci, co), i in zip(chans, idx):
        sd[f"features.{i}.weight"] = rng.randn(co, ci, 3, 3).astype(np.float32)
        sd[f"features.{i}.bias"] = rng.randn(co).astype(np.float32)
    tree = convert_torchvision_vgg16(sd)
    enc = tree["params"]["encoder"]
    assert set(enc.keys()) == {
        "stage1_conv1", "stage1_conv2", "stage2_conv1", "stage2_conv2",
        "stage3_conv1", "stage3_conv2", "stage3_conv3",
        "stage4_conv1", "stage4_conv2", "stage4_conv3",
        "stage5_conv1", "stage5_conv2", "stage5_conv3"}
    np.testing.assert_allclose(
        enc["stage3_conv2"]["conv"]["kernel"],
        np.transpose(sd["features.12.weight"], (2, 3, 1, 0)))


def test_orbax_checkpoint_roundtrip(tmp_path, rng):
    """save_checkpoint → restore_into roundtrip with overlay semantics."""
    from rpnet_tpu.train.checkpoint import restore_into, save_checkpoint

    _, variables = _init_unet_model()
    # perturb a leaf so restore provably overwrites it
    perturbed = jax.tree_util.tree_map(lambda x: x, variables)
    path = str(tmp_path / "ckpt_e3")
    save_checkpoint(path, step=3, variables=variables)

    fresh_model, fresh_vars = _init_unet_model()
    fresh_vars["params"]["encoder"]["enc1"]["conv1"]["conv"]["kernel"] = (
        np.zeros_like(fresh_vars["params"]["encoder"]["enc1"]["conv1"]["conv"]["kernel"]))
    restored, step = restore_into(fresh_vars, path)
    assert step == 3
    np.testing.assert_allclose(
        restored["params"]["encoder"]["enc1"]["conv1"]["conv"]["kernel"],
        variables["params"]["encoder"]["enc1"]["conv1"]["conv"]["kernel"])


def test_structure_only_restore(tmp_path, rng):
    """restore_into accepts a jax.eval_shape structure in place of real init
    values (the eval CLI's 30-s-saving fast path) — full coverage restores
    exactly; partial coverage raises IncompleteCheckpointError."""
    from rpnet_tpu.train.checkpoint import (IncompleteCheckpointError,
                                            restore_into, save_checkpoint)

    _, variables = _init_unet_model()
    path = str(tmp_path / "ckpt_full")
    save_checkpoint(path, step=5, variables=variables)

    struct = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        variables)
    restored, step = restore_into(struct, path)
    assert step == 5
    jax.tree_util.tree_map(
        lambda r, v: np.testing.assert_array_equal(np.asarray(r),
                                                   np.asarray(v)),
        restored, variables)

    # partial checkpoint: drop a subtree → the structure restore must refuse
    partial = {"params": {k: v for k, v in variables["params"].items()
                          if k != "encoder"}}
    ppath = str(tmp_path / "ckpt_partial")
    save_checkpoint(ppath, step=1, variables=partial)
    with pytest.raises(IncompleteCheckpointError):
        restore_into(struct, ppath)


def test_torch_pth_checkpoint_loads(tmp_path, rng):
    """A reference-format .pth checkpoint converts + overlays transparently."""
    import torch

    _, variables = _init_unet_model()
    k = variables["params"]["encoder"]["enc1"]["conv1"]["conv"]["kernel"]
    w = rng.randn(k.shape[3], k.shape[2], 3, 3).astype(np.float32)
    sd = {"encoder.Conv1.conv.0.weight": torch.from_numpy(w)}
    pth = str(tmp_path / "ref.pth")
    torch.save({"epoch": 7, "state_dict": sd, "optimizer": {}}, pth)

    from rpnet_tpu.train.checkpoint import restore_into
    restored, step = restore_into(variables, pth)
    assert step == 7
    np.testing.assert_allclose(
        restored["params"]["encoder"]["enc1"]["conv1"]["conv"]["kernel"],
        np.transpose(w, (2, 3, 1, 0)))


def test_restore_into_routes_lgca_state_dicts(tmp_path, rng):
    """A torch .pth whose keys are LGCA-namespaced restores through
    convert_lgca_state_dict (an RP_Net-mapped restore would match nothing
    and silently keep the random init)."""
    import torch

    from rpnet_tpu.models.lgca import LGCANetV3
    from rpnet_tpu.train.checkpoint import restore_into

    model = LGCANetV3(output_ch=2)
    vol = jnp.zeros((1, 8, 16, 16, 1), jnp.float32)
    sli = jnp.zeros((2, 32, 32, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), vol, sli, train=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)

    # build a reference-shaped state_dict from OUR params (torch tensors with
    # reference key names) for one easily-identified leaf + full coverage of
    # the enc1 block
    k = np.asarray(variables["params"]["unet"]["enc1"]["conv1"]["conv"]["kernel"])
    sd = {"unet.Conv1.conv.0.weight":
          torch.from_numpy(np.transpose(k, (3, 2, 0, 1)).copy() * 2.0),
          "unet.Conv1.conv.0.bias": torch.zeros(k.shape[-1])}
    # make it unambiguously LGCA-namespaced
    sd["context_net.preBlock.0.weight"] = torch.from_numpy(
        np.transpose(np.asarray(
            variables["params"]["context_net"]["pre_conv1"]["kernel"]),
            (4, 3, 0, 1, 2)).copy())
    sd["context_net.preBlock.0.bias"] = torch.zeros(24)
    path = str(tmp_path / "lgca.pth")
    torch.save({"epoch": 3, "state_dict": sd}, path)

    restored, step = restore_into(variables, path, model_name="LGCANet_V3")
    assert step == 3
    got = np.asarray(restored["params"]["unet"]["enc1"]["conv1"]["conv"]["kernel"])
    np.testing.assert_allclose(got, k * 2.0, rtol=1e-6)


def test_restore_opt_state_roundtrip(tmp_path, rng):
    """restore_opt_state recovers the exact optax pytree from an orbax
    checkpoint (structure check via metadata — no double full read) and
    returns None when the checkpoint stores no opt_state."""
    import optax

    from rpnet_tpu.train.checkpoint import restore_opt_state, save_checkpoint

    params = {"w": np.asarray(rng.randn(3, 4), np.float32)}
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    # step it so the moments are non-trivial
    g = {"w": np.ones((3, 4), np.float32)}
    updates, opt_state = opt.update(g, opt_state, params)

    p1 = str(tmp_path / "with_opt")
    save_checkpoint(p1, 7, {"params": params}, opt_state=opt_state)
    fresh = opt.init(params)
    restored = restore_opt_state(fresh, p1)
    assert restored is not None
    chex_leaves = jax.tree_util.tree_leaves(restored)
    ref_leaves = jax.tree_util.tree_leaves(opt_state)
    assert len(chex_leaves) == len(ref_leaves)
    for a, b in zip(chex_leaves, ref_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    p2 = str(tmp_path / "no_opt")
    save_checkpoint(p2, 7, {"params": params})
    assert restore_opt_state(opt.init(params), p2) is None


def test_fast_forward_opt_state_sets_counts(rng):
    """fast_forward_opt_state moves every count leaf (Adam bias correction +
    LR-schedule position) so a .pth resume continues the decayed LR."""
    import optax

    from rpnet_tpu.train.trainer import fast_forward_opt_state

    params = {"w": np.ones((2, 2), np.float32)}
    sched = optax.exponential_decay(1e-3, 10, 0.1, staircase=True)
    opt = optax.adamw(sched)
    st = fast_forward_opt_state(opt.init(params), 25)
    counts = [np.asarray(leaf) for path, leaf
              in jax.tree_util.tree_flatten_with_path(st)[0]
              if jax.tree_util.keystr(path).endswith("count")]
    assert counts and all(c == 25 for c in counts)
    # the next update uses the decayed LR (25 updates = 2 staircase drops)
    g = {"w": np.ones((2, 2), np.float32)}
    updates, _ = opt.update(g, st, params)
    # adam with fast-forwarded moments of 0: |update| ≈ lr at count drop
    assert float(np.abs(np.asarray(updates["w"])).max()) < 1e-3 * 0.5


def test_apply_pretrained_vgg_warm_start(tmp_path, rng):
    """YAML `pretrained_path` + vgg backbone loads a torchvision VGG16
    checkpoint positionally into the encoder (net/vgg.py:65-74 semantics)."""
    import torch

    from rpnet_tpu.config import Config
    from rpnet_tpu.models.factory import model_factory
    from rpnet_tpu.train.checkpoint import apply_pretrained

    cfg = Config({"backbone": "vgg", "crop_size": [32, 32],
                  "n_iter_refinement": 1,
                  "mask_refinement_correlation_radius": 1, "scale": 8})
    model = model_factory["RP_Net"](cfg, align=False, num_iter=1)
    dummy = (jnp.zeros((1, 1, 1, 32, 32, 1)), jnp.zeros((1, 1, 1, 32, 32)),
             jnp.ones((1, 1, 1, 32, 32)), jnp.zeros((1, 32, 32, 1)),
             jnp.zeros((1, 32, 32)))
    variables = model.init(jax.random.PRNGKey(0), *dummy, train=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)

    # torchvision-style state_dict: first conv (3->64) is enough to detect
    w0 = rng.randn(64, 3, 3, 3).astype(np.float32)
    sd = {"features.0.weight": torch.from_numpy(w0),
          "features.0.bias": torch.zeros(64)}
    path = str(tmp_path / "vgg16.pth")
    torch.save(sd, path)

    out = apply_pretrained(variables, Config({"backbone": "vgg",
                                              "pretrained_path": path}))
    got = np.asarray(out["params"]["encoder"]["stage1_conv1"]["conv"]["kernel"])
    np.testing.assert_allclose(got, np.transpose(w0, (2, 3, 1, 0)), rtol=1e-6)
    # untouched layers keep their init
    same = np.asarray(out["params"]["encoder"]["stage1_conv2"]["conv"]["kernel"])
    np.testing.assert_array_equal(
        same, np.asarray(variables["params"]["encoder"]["stage1_conv2"]["conv"]["kernel"]))
