"""Config system: the YAML experiment file is the public interface.

The YAML schema is kept key-for-key compatible with the reference
(/root/reference/yamls/example.yml, loaded by utils/util.py:79-88 `load_yaml`):
a single flat YAML dict drives data paths, episode shape, model choice,
registration switches, refinement settings and the eval protocol.

On top of the raw dict we provide :class:`Config`, a typed view that documents
every key and its default (the reference scatters `.get()` defaults through the
code, e.g. `scale` at net/rp_net.py:200 and `crop_size` at
dataset/few_shot_reader.py:341).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import yaml


class Struct:
    """Attribute-style view over a dict (mirror of utils/util.py:80-82)."""

    def __init__(self, **entries):
        self.__dict__.update(entries)


def load_yaml(path: str):
    """Load a YAML experiment file.

    Returns ``(data_dict, data_class)`` — the same (dict, attribute-struct)
    pair as the reference `load_yaml` (utils/util.py:79-88): the dict feeds the
    dataset/model code, the struct feeds the CLI.
    """
    with open(path) as f:
        data_dict = yaml.load(f, Loader=yaml.FullLoader)
    return data_dict, Struct(**data_dict)


# Defaults for keys that the reference reads with .get(...) fallbacks, plus the
# values shipped in yamls/example.yml. Every key the reference consumes is here.
_DEFAULTS: Dict[str, Any] = {
    # --- data geometry (few_shot_reader.py:385-398, :341-343) ---
    "num_slice": 280,
    "num_x": 272,
    "num_y": 272,
    "crop_size": [256, 256],
    "pad_value": -1024,
    "HU_range": [-1024, 3072],
    # --- brain/volume reader geometry (brain_reader.py:297-358; values from
    #     the reference's own example.yml) — hard config[...] reads in
    #     BrainReader/Crop must not KeyError from shipped configs ---
    "train_max_crop_size": [256, 256, 256],
    "test_max_size": [256, 320, 320],
    "jitter_range": [4, 16, 16],
    "bbox_border": 8,
    # --- episode shape (few_shot_reader.py:256-257, :464-473, :517) ---
    "n_shot": 1,
    "n_way": 1,
    "k": 12,
    "test_shot": None,         # defaults to n_shot (few_shot_reader.py:517)
    # --- splits ---
    "data_dir": "",
    "train_set_name": "split/abd_110_train.csv",
    "eval_set_name": "split/abd_110_test.csv",
    "class_csv_dir": "./split/abd_110_classes",
    "train_classes": ["Spleen", "Kidney L", "Kidney R"],
    "eval_classes": ["Liver"],
    # --- model (net/model.py:4-7, net/rp_net.py:195-224) ---
    "net": "RP_Net",
    "backbone": "UNet",        # vgg | UNet | resnet
    "scale": 4,                # feature-map downsample used for mask pooling
    "chanel": 1,               # sic — input channels key as spelled in example.yml:51
    "unet_normalize_type": "BatchNorm2d",
    "mask_feature_map": "no",  # {x, x2, x3, x4, x5, no} mask injection (net/unet.py:401-424)
    "use_relation_enc": "relation",  # relation | concat (net/rp_net.py:202)
    "pretrained_path": None,
    # --- refinement (net/rp_net.py:201, :281-312; example.yml:107-110) ---
    "n_iter_refinement": 4,
    "n_test_iter_refinement": 10,
    "soft_mask": False,
    "mask_refinement_correlation_radius": 5,
    # --- registration (few_shot_reader.py:556-557, example.yml:99-101) ---
    # False skips registration: raw support feeds the net and the raw support
    # label becomes the prior (the reference reader CRASHES in this mode —
    # FewshotRegReader indexes the None affine_reg_pred,
    # few_shot_reader.py:556-565 → :605-608; this is the sensible lift)
    "use_registration_loss": True,
    # In the reference, the mask/reg channel concats this toggles are
    # DISCARDED by FewshotRegReader (it reads affine_warped_supp, not the
    # mutated support_images) — only Fewshot3DReader sees them. Accepted for
    # YAML compatibility; the RP_Net eval path matches the reference with it
    # on or off.
    "use_registration_mask": True,
    "do_deformable": False,
    "reg_affine_iters": 50,    # few_shot_reader.py:159 iters=[50, ...]
    "reg_demons_iters": 50,    # few_shot_reader.py:138
    "reg_lr": 0.01,            # few_shot_reader.py:148-149
    "reg_sigma": 2.0,          # GaussianRegulariser sigma (few_shot_reader.py:150)
    "reg_fit_scale": 1,        # TPU perf knob: fit theta on a /N image (1 = reference-exact)
    "reg_sampler": "matmul",   # bilinear impl in the fit: matmul (MXU-fast) | gather (torch-exact trajectory)
    # --- augmentation (example.yml:34,111-114) ---
    "do_elastic": True,
    "do_intaug": True,
    "gamma_range": [0.5, 1.5],
    # --- optimizer block (example.yml:62-73; unused at eval) ---
    "batch_size": 4,
    "optimizer": "Adam",
    "init_lr": 1e-5,
    "momentum": 0.9,
    "weight_decay": 1e-4,
    "epochs": 100,
    "epoch_save": 1,
    "num_workers": 4,
    "lr_schedule": "lr_shedule",   # accepted, inert — the reference never reads it (grep-clean)
    "scheduler_step": 30,
    "loss": "dice_ce",
    "align_loss_scaler": 1.0,
    "reg_loss_scaler": 0.0,    # accepted, inert — dead in the reference too
    "reg_ft_scale": 1,         # accepted, inert — dead in the reference too
    # --- eval protocol (test_rpnet.py:112-145) ---
    "n_runs": 5,
    "ckpt": None,
    "out_dir": None,
    # --- misc / LGCA keys kept for schema compatibility ---
    "final_activation": "sigmoid",
    "context_net_downsample_scale": [2, 2, 2],
    "do_postprocess": False,   # accepted, inert — dead in the reference too
    "use_DSC": True,
    "radius": 4,               # accepted, inert — dead in the reference too
    # --- TPU-native additions (absent from the reference) ---
    "mesh_shape": None,        # e.g. {"data": 8}; None = all devices on "data"
    "slice_bucket": 32,        # pad #query-slices to a multiple of this (static shapes)
    "max_slices": 288,         # hard cap on padded query slices per episode
    "compute_dtype": None,     # None = auto: bfloat16 network at eval/serving
                               # (registration + metrics stay f32), float32 at
                               # train. Set explicitly to pin either driver
                               # (round-3 A/B: bf16 eval +5% eps/s, ≤0.004
                               # dice delta at 10 refinement iters on a
                               # trained ckpt; bf16 TRAIN measured slower —
                               # docs/perf_trace_r3.md).
    "use_pallas": True,        # use Pallas correlation kernel on TPU
    "refinement_unroll": None, # lax.scan unroll factor for the refinement
                               # recurrence. None = auto: n_iter_refinement in
                               # the train CLI (measured 0.211 → 0.194 s/step,
                               # +8%, on the full-size train step — XLA fuses
                               # across unrolled iteration bodies), 1 at eval
                               # (10-iter eval program: unrolling decuples the
                               # program body for no measured win and multiplies
                               # the tunnel compile time). Values-identical to
                               # f32 reassociation noise (docs/perf_trace_r4.md).
    "use_native_io": True,     # C++ NRRD decoder + raw cache (core/native_cache)
    "volume_cache": 8,         # sampler LRU over preprocessed volumes (entries;
                               # 0 disables) — eval revisits the same volumes
                               # every run (test_rpnet.py:112-145)
    "io_cache_dir": None,      # where .rawcache files go (default: beside the NRRDs)
    "device_volume_cache": 16, # DEVICE-resident volume LRU for eval (entries;
                               # 0 disables): volumes upload once, episodes
                               # assemble on device by row gather (EpisodeSpec)
                               # — kills the ~MB/episode host→device upload
                               # (6× warm CLI, docs/perf_trace_r4.md)
    "use_all_supports": False, # lift the reference's eval support-overwrite defect
    "multishot_fusion": False, # native multi-support mode: register EVERY shot,
                               # fuse prototypes over shots (BASELINE config 3)
    "eval_3d": False,          # whole-volume sliding-window eval (every query
                               # slice segmented; episode/volume3d.py)
    "overlap_3d": 8,           # z-overlap between eval_3d windows
    "compilation_cache_dir": None,  # persistent XLA compile cache (None =
                               # ~/.cache/rpnet_tpu/xla; "" disables)
    "seed": 0,
}


@dataclasses.dataclass
class Config:
    """Typed view over the flat YAML dict.

    Unknown keys are preserved in ``extra`` so round-tripping a reference YAML
    is lossless. Access via attributes or ``cfg[key]`` / ``cfg.get(key, dflt)``
    (dict-style access keeps dataset/model code close to the reference shape).
    """

    raw: Dict[str, Any] = dataclasses.field(default_factory=dict)

    def __post_init__(self):
        merged = dict(_DEFAULTS)
        merged.update({k: v for k, v in self.raw.items() if v is not None or k not in _DEFAULTS})
        if merged.get("test_shot") is None:
            merged["test_shot"] = merged["n_shot"]
        self._d = merged

    # dict-style access ----------------------------------------------------
    def __getitem__(self, key):
        return self._d[key]

    def __contains__(self, key):
        return key in self._d

    def get(self, key, default=None):
        return self._d.get(key, default)

    def __getattr__(self, key):
        d = object.__getattribute__(self, "__dict__").get("_d")
        if d is not None and key in d:
            return d[key]
        raise AttributeError(key)

    def to_dict(self) -> Dict[str, Any]:
        return dict(self._d)

    def replace(self, **kw) -> "Config":
        d = dict(self.raw)
        d.update(kw)
        return Config(d)

    @classmethod
    def from_yaml(cls, path: str) -> "Config":
        data_dict, _ = load_yaml(path)
        return cls(data_dict)
