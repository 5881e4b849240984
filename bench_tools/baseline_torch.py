#!/usr/bin/env python
"""Measure the PyTorch reference's episode throughput on CPU.

The reference repo publishes no numbers (BASELINE.md), so the comparison
anchor is self-measured: this script *executes the reference implementation*
(/root/reference, unmodified, mounted read-only) on the same synthetic
workload bench.py uses — per-slice 50-iteration affine registration
(few_shot_reader.get_registration_field semantics) + RP_Net forward with 10
refinement iterations in microbatches of 2 (test_rpnet.py:164,189-205) — and
writes the episodes/sec to bench_baseline.json.

The image lacks several of the reference's imports (torchviz, pydicom,
SimpleITK, skimage, nrrd, nibabel); they're stubbed since the measured code
paths never touch them. Slice count can be reduced (--slices) and the result
extrapolates linearly (cost is per-slice).
"""

import argparse
import json
import os
import sys
import time
import types

REFERENCE = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "bench_baseline.json")


def _stub(name, **attrs):
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_stubs():
    _stub("torchviz", make_dot=lambda *a, **k: None)
    _stub("pydicom", dcmread=None)
    sys.modules["dicom"] = sys.modules["pydicom"]
    _stub("SimpleITK")
    sk = _stub("skimage")
    sk.measure = _stub("skimage.measure")
    _stub("nrrd", read=None, write=None)
    _stub("nibabel")
    _stub("sklearn")
    _stub("sklearn.metrics", precision_score=None, recall_score=None)
    tv = _stub("torchvision")
    tv.models = _stub("torchvision.models", resnet18=None, vgg16=None)
    tv.models.resnet = _stub("torchvision.models.resnet", BasicBlock=object)
    tv.transforms = _stub("torchvision.transforms", Compose=None,
                          RandomAffine=None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slices", type=int, default=4,
                    help="slices measured; extrapolated to --full-slices")
    ap.add_argument("--full-slices", type=int, default=32)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--refine-iters", type=int, default=10)
    ap.add_argument("--threads", type=int, default=0)
    args = ap.parse_args()

    install_stubs()
    sys.path.insert(0, REFERENCE)

    import numpy as np
    import torch

    if args.threads:
        torch.set_num_threads(args.threads)

    # CPU-only: neutralize .cuda() moves in the reference
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    from net.registration import (AffineDemonsRegistration, GaussianRegulariser,
                                  compute_grid)
    from net.rp_net import RP_Net

    H = W = args.crop
    Dq = args.slices
    rng = np.random.RandomState(0)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    organ = lambda cy, cx, ry, rx: ((((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2) < 1).astype(np.float32)
    sl = organ(H * .45, W * .45, H * .2, W * .15)
    ql = organ(H * .55, W * .55, H * .21, W * .16)
    supp = (sl * .8 - .5 + .05 * rng.randn(Dq, H, W)).astype(np.float32)
    qry = (ql * .8 - .5 + .05 * rng.randn(Dq, H, W)).astype(np.float32)
    supp_lab = np.repeat(sl[None], Dq, 0)
    qry_lab = np.repeat(ql[None], Dq, 0)

    cfg = {
        "backbone": "UNet", "unet_normalize_type": "BatchNorm2d",
        "mask_feature_map": "no", "n_iter_refinement": args.refine_iters,
        "soft_mask": False, "mask_refinement_correlation_radius": 5,
        "scale": 4, "final_activation": "sigmoid",
    }
    net = RP_Net(pretrained_path=None, cfg={"align": False, "backbone": "UNet"},
                 backbone_cfg=cfg)
    net.eval()

    # ---- stage 1: per-slice registration fits (few_shot_reader.py:109-198) --
    t0 = time.time()
    appr, warped_fore, warped_supp = [], [], []
    for i in range(Dq):
        src = torch.from_numpy((supp[i] + 1) / 2)[None, None]
        dst = torch.from_numpy((qry[i] + 1) / 2)[None, None]
        lab = torch.from_numpy(supp_lab[i])[None, None]
        reg = AffineDemonsRegistration((H, W), use_diffeomorphic=True,
                                       use_GPU=False, stop_shear=False)
        opt_a = torch.optim.Adam(reg.affine_reg.parameters(), lr=0.01)
        opt_d = torch.optim.Adam(reg.demons.parameters(), lr=0.01)
        regu = GaussianRegulariser([1, 1], sigma=[2, 2], dtype=torch.float32,
                                   device="cpu")
        reg.train_registraion(src, dst, [opt_a, opt_d], regulariser=regu,
                              iters=[50, 0], regularise_displacement=False)
        grid = compute_grid((H, W))
        with torch.no_grad():
            wl = reg(lab, grid)
            appr.append((wl[0, 0].numpy() > 0.1).astype(np.float32))
            fl = reg.affine_reg(lab)
            warped_fore.append((fl[0, 0].numpy() > 0.1).astype(np.float32))
            ws = reg.affine_reg(src)
            warped_supp.append(ws[0, 0].numpy() * 2 - 1)
    t_reg = time.time() - t0
    print(f"registration: {t_reg:.1f}s for {Dq} slices "
          f"({t_reg / Dq:.2f}s/slice)", file=sys.stderr)

    # ---- stage 2: network forward, microbatches of 2 (test_rpnet.py:189) ----
    appr_t = torch.from_numpy(np.stack(appr))
    fore_t = torch.from_numpy(np.stack(warped_fore))
    supp_t = torch.from_numpy(np.stack(warped_supp))[:, None]
    qry_t = torch.from_numpy(qry)[:, None]
    bs = 2
    t0 = time.time()
    with torch.no_grad():
        for i in range(int(np.ceil(Dq / bs))):
            s = slice(i * bs, (i + 1) * bs)
            out = net([[supp_t[s]]], [[fore_t[s]]], [[1 - fore_t[s]]],
                      [qry_t[s]], appr_query_labels=appr_t[s])
    t_net = time.time() - t0
    print(f"network: {t_net:.1f}s for {Dq} slices ({t_net / Dq:.2f}s/slice)",
          file=sys.stderr)

    per_slice = (t_reg + t_net) / Dq
    full_episode = per_slice * args.full_slices
    eps_per_sec = 1.0 / full_episode
    result = {
        "episodes_per_sec": eps_per_sec,
        "slices_per_sec": 1.0 / per_slice,
        "sec_per_slice_registration": t_reg / Dq,
        "sec_per_slice_network": t_net / Dq,
        "measured_slices": Dq,
        "extrapolated_slices": args.full_slices,
        "crop": args.crop,
        "device": "cpu",
        "torch_threads": torch.get_num_threads(),
        "note": "PyTorch reference (/root/reference) on CPU; per-slice cost "
                "extrapolated linearly to a full episode",
    }
    print(json.dumps(result, indent=2))
    with open(os.path.abspath(OUT), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
