"""Whole-volume 3D sliding-window episodic eval (BASELINE.json config 5 —
the scale-stretch mode with no reference counterpart).

Instead of the k-bin slice subsampling of the 2D episodic protocol
(few_shot_reader.py:465-545), every query slice gets the support slice at the
nearest normalized z-position (the natural whole-volume generalization of the
reference's Fewshot3DReader sketch, few_shot_reader.py:401-436), and the
volume is processed in overlapping z-windows of the compiled episode program:

  * each window is one invocation of the SAME bucketed jit (no recompiles);
  * windows batch arbitrarily long volumes past ``max_slices``;
  * overlapping predictions average (prob space) before thresholding;
  * windows shard across the mesh via the underlying runner.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from rpnet_tpu.core.metrics import dice_score_seperate
from rpnet_tpu.episode.pipeline import EpisodeRunner
from rpnet_tpu.episode.sampler import Episode, EpisodeSpec


def match_support_slices(n_support: int, n_query: int) -> np.ndarray:
    """Nearest normalized-z support index for each query slice."""
    if n_query == 1:
        return np.zeros((1,), np.int32)
    q = np.arange(n_query) / (n_query - 1)
    return np.clip(np.round(q * (n_support - 1)), 0, n_support - 1).astype(np.int32)


@dataclasses.dataclass
class VolumeResult:
    prediction: np.ndarray       # (Dq, H, W) binary
    appr_label: np.ndarray       # (Dq, H, W) registration prior
    dsc_affine: Optional[float]
    dsc_fewshot: Optional[float]
    n_windows: int


class Volume3DRunner:
    """Sliding-window whole-volume eval on top of :class:`EpisodeRunner`."""

    def __init__(self, runner: EpisodeRunner, overlap: int = 8):
        self.runner = runner
        self.window = runner.bucket
        self.overlap = min(overlap, self.window // 2)

    def run_volume(self, support_vol: np.ndarray, support_lab: np.ndarray,
                   query_vol: np.ndarray, query_lab: np.ndarray,
                   sampler=None, supp_key=None, qry_key=None) -> VolumeResult:
        """support_vol/lab: (Ds, H, W); query_vol/lab: (Dq, H, W).

        With ``sampler`` + volume keys given and a spec-capable runner, each
        window ships as an :class:`EpisodeSpec` (volumes resident on device,
        window = row indices) — upload per window drops from ~2·window·H·W
        floats to the index vectors. Value-exact: the gathered rows are the
        same f32 values the host would slice.
        """
        Dq, H, W = query_vol.shape
        match = match_support_slices(support_vol.shape[0], Dq)
        use_spec = (sampler is not None and supp_key is not None
                    and qry_key is not None
                    and getattr(self.runner, "supports_spec", False))
        if not use_spec:
            supp_img = support_vol[match]
            supp_lab = support_lab[match]

        stride = self.window - self.overlap
        starts = list(range(0, max(Dq - self.overlap, 1), stride))
        # clamp final window inside the volume (full overlap at the tail)
        starts = sorted({min(s, max(Dq - self.window, 0)) for s in starts})

        prob_sum = np.zeros((Dq, H, W), np.float64)
        prior_sum = np.zeros((Dq, H, W), np.float64)
        counts = np.zeros((Dq, 1, 1), np.float64)
        # software pipeline: dispatch window i+1 before fetching window i so
        # the device never idles on the host-side accumulate (jax async
        # dispatch keeps one window in flight)
        pending = None
        for s in starts + [None]:
            out = None
            if s is not None:
                e = min(s + self.window, Dq)
                if use_spec:
                    ep = EpisodeSpec(
                        supp_key, qry_key, match[None, s:e], e - s,
                        0, "", [(0, 0)],
                        qry_rows=np.arange(s, e, dtype=np.int32))
                    out = (s, e, ep, self.runner.dispatch_spec(ep, sampler))
                else:
                    ep = Episode(
                        support_images=supp_img[None, s:e].astype(np.float32),
                        support_labels=supp_lab[None, s:e].astype(np.float32),
                        query_images=query_vol[s:e].astype(np.float32),
                        query_labels=query_lab[s:e].astype(np.float32),
                        class_id=0, pid="", supp_pids=[(0, 0)])
                    out = (s, e, ep, self.runner.dispatch(ep))
            if pending is not None:
                ps, pe, pep, pout = pending
                res = self.runner.finalize(pout, pep)
                n = pe - ps
                prob_sum[ps:pe] += res["prediction"][:n]
                prior_sum[ps:pe] += res["appr_label"][:n]
                counts[ps:pe] += 1.0
            pending = out

        pred = (prob_sum / np.maximum(counts, 1) > 0.5).astype(np.float32)
        prior = (prior_sum / np.maximum(counts, 1) > 0.5).astype(np.float32)
        dsc_few = dice_score_seperate(pred[None], query_lab[None], num_class=1)[0]
        dsc_aff = dice_score_seperate(prior[None], query_lab[None], num_class=1)[0]
        return VolumeResult(prediction=pred, appr_label=prior,
                            dsc_affine=dsc_aff, dsc_fewshot=dsc_few,
                            n_windows=len(starts))


class Volume3DSampler:
    """Whole-volume episodes (the reference's Fewshot3DReader intent):
    yields (support_vol, support_lab, query_vol, query_lab, meta)."""

    def __init__(self, sampler):
        self.sampler = sampler   # an EpisodeSampler (volume loading reused)

    def __len__(self):
        return len(self.sampler)

    def sample(self, idx: int):
        import random

        s = self.sampler
        ci, di = s.indices[idx]
        pid = s.data_info[ci][di]["pid"]
        pool = [i for i in range(len(s.data_info[ci])) if i != di]
        pick = random.choices(pool, k=1)[0]
        supp_pid = s.data_info[ci][pick]["pid"]
        supp_img, supp_lab = s.load_image_and_mask(supp_pid, s.classes[ci])
        qry_img, qry_lab = s.load_image_and_mask(pid, s.classes[ci])
        return (supp_img, supp_lab, qry_img, qry_lab,
                {"pid": pid, "supp_pid": supp_pid, "class_id": ci,
                 "supp_key": (supp_pid, s.classes[ci]),
                 "qry_key": (pid, s.classes[ci])})
