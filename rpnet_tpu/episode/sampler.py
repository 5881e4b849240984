"""Host-side episodic sampler: volumes → fixed-shape slice episodes.

Rebuild of the dataset layer (dataset/few_shot_reader.py), split cleanly into
pure pieces:

  * volume loading + preprocessing  — FewshotVolumeReader.load_image_and_mask
    (few_shot_reader.py:324-345): NRRD read → truncate → pad2factor(16) →
    z-crop to annotation → center-crop → HU normalize;
  * episode index & support sampling — (class, volume) pairs, supports drawn
    by ``random.choices`` excluding the query (few_shot_reader.py:255-283);
    stdlib ``random`` is kept on purpose for seed-sequence parity with the
    reference's seeded eval (test_rpnet.py:8-10);
  * slice binning — k evenly spaced support slices matched to query-slice
    bins (few_shot_reader.py:465-545), including the eval-mode ``test_shot``
    shot-offset expansion;
  * train-mode augmentation — gamma jitter + random affine + shuffle
    (few_shot_reader.py:482-515).

Registration does NOT happen here (the reference runs 50 Adam iterations per
slice inside __getitem__, few_shot_reader.py:134) — it is a compiled device
stage in episode/pipeline.py.

Known reference defects handled (SURVEY.md §2.1 "latent defects"):
  * eval support loop overwrites across supports → only the LAST sampled
    support volume is used; replicated (flag ``use_all_supports`` lifts it);
  * `make_support_query_same_size` pads labels with shape[1] twice — here the
    pad is computed correctly (identical behavior for square crops).
"""

from __future__ import annotations

import dataclasses
import os
import random
from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from rpnet_tpu.core import nrrd_io
from rpnet_tpu.core.transforms import (crop, keep_only_annotation_z_slices,
                                       normalize, pad2factor, truncate_image)


@dataclasses.dataclass
class Episode:
    """One eval/train episode, fixed shapes, ready for the device pipeline.

    All arrays are float32; slice axis leads.
      support_images: (test_shot, Dq, H, W) in [-1, 1]
      support_labels: (test_shot, Dq, H, W) binary
      query_images:   (Dq, H, W) in [-1, 1]
      query_labels:   (Dq, H, W) binary
    """
    support_images: np.ndarray
    support_labels: np.ndarray
    query_images: np.ndarray
    query_labels: np.ndarray
    class_id: int
    pid: str
    supp_pids: List[Tuple[int, int]]

    @property
    def n_slices(self) -> int:
        return self.query_images.shape[0]


@dataclasses.dataclass
class EpisodeSpec:
    """A device-assemblable eval episode: volume KEYS + slice indices.

    Eval episode assembly is pure indexing (few_shot_reader.py:516-545:
    support slices repeat per query bin, the query volume feeds through
    verbatim), so instead of re-uploading ~13 MB of assembled slices per
    episode through the tunnel, the runner caches each (pid, roi) volume ON
    DEVICE once and gathers rows in-program — per-episode host→device
    traffic drops to a few hundred index bytes (round-4 CLI-path work,
    docs/perf_trace_r4.md).
    """
    supp_key: Tuple[str, str]       # (pid, roi) of the winning support volume
    qry_key: Tuple[str, str]
    supp_rows: np.ndarray           # (test_shot, Dq) int32 rows into support
    n_slices: int                   # Dq — query rows default to 0..Dq-1
    class_id: int
    pid: str
    supp_pids: List[Tuple[int, int]]
    qry_rows: Optional[np.ndarray] = None   # explicit query rows (e.g. a 3D
                                            # sliding window s..e)


def slice_bins(num_support_slices: Sequence[int], num_query_slices: int, k: int):
    """Support/query slice binning (few_shot_reader.py:465-473).

    Returns (k, support_indices per support, query_bin_edges).
    """
    nums = list(num_support_slices) + [num_query_slices]
    k = min([k] + nums)
    support_idx = [
        np.floor(np.arange(n / k / 2, n, n / k)).astype(np.int32)[:k]
        for n in num_support_slices
    ]
    edges = np.arange(0, num_query_slices, num_query_slices / k).tolist() + [num_query_slices]
    edges = np.floor(np.array(edges)).astype(np.int32)[:k + 1]
    edges[-1] = num_query_slices
    return k, support_idx, edges


class EpisodeSampler:
    """Episodic dataset over a preprocessed NRRD directory."""

    def __init__(self, data_dir: str, set_name: str, config, mode: str = "train"):
        self.data_dir = data_dir
        self.cfg = config
        self.mode = mode
        self.class_csv_dir = config["class_csv_dir"]

        if set_name.endswith(".csv"):
            names = np.genfromtxt(set_name, dtype=str, delimiter="\n")
            self.filenames = [str(n) for n in np.atleast_1d(names)]
        elif set_name.endswith(".npy"):
            self.filenames = [str(n) for n in np.load(set_name)]
        else:
            raise ValueError(f"unsupported split file {set_name}")

        self.classes = (config["train_classes"] if mode == "train"
                        else config["eval_classes"])
        self._read_data_meta()
        self.indices: List[Tuple[int, int]] = [
            (ci, di) for ci in range(len(self.classes))
            for di in range(len(self.data_info[ci]))
        ]
        # LRU over load_image_and_mask results: the eval protocol revisits
        # the same handful of volumes on every run (test_rpnet.py:112-145
        # draws supports from the same split each run), and the whole
        # per-volume chain (read+truncate+crop+normalize, ~90 ms) is
        # deterministic given the config — cache entries are returned
        # read-only. ``volume_cache: 0`` disables.
        self._vol_cache: "OrderedDict[Tuple[str, str], Tuple[np.ndarray, np.ndarray]]" = OrderedDict()
        self._vol_cache_max = int(config.get("volume_cache", 8))

    # ------------------------------------------------------------------ meta
    def _read_data_meta(self):
        import csv
        self.data_info: List[List[Dict]] = []
        names = set(self.filenames)
        for roi in self.classes:
            rows = []
            with open(os.path.join(self.class_csv_dir, f"{roi}.csv")) as f:
                for row in csv.DictReader(f):
                    if row["pid"] in names:
                        rows.append({"pid": row["pid"],
                                     "z_start": row["z_start"],
                                     "z_end": row["z_end"]})
            self.data_info.append(rows)

    def __len__(self):
        return len(self.indices)

    # ------------------------------------------------------------------ io
    def _read_volume(self, path: str):
        """NRRD read through the native raw-cache when enabled (C++ decoder,
        rpnet_tpu/native) — single-pread loads after the first touch."""
        if self.cfg.get("use_native_io", True):
            from rpnet_tpu.core import native_cache
            arr, _ = native_cache.read_cached(
                path, cache_dir=self.cfg.get("io_cache_dir"))
            return arr
        arr, _ = nrrd_io.read(path)
        return arr

    def load_image_and_mask(self, pid: str, roi: str):
        """The per-volume preprocessing chain (few_shot_reader.py:324-345)."""
        key = (pid, roi)
        hit = self._vol_cache.get(key)
        if hit is not None:
            self._vol_cache.move_to_end(key)
            return hit
        cfg = self.cfg
        pad_factor = 16
        mask = self._read_volume(os.path.join(self.data_dir, f"{pid}_{roi}.nrrd"))
        mask = mask.astype(np.float32)
        mask = truncate_image(mask, cfg["num_slice"], cfg["num_x"], cfg["num_y"])
        mask = pad2factor(mask, factor=pad_factor, pad_value=0)[None]

        imgs = self._read_volume(os.path.join(self.data_dir, f"{pid}_clean.nrrd"))
        imgs = truncate_image(imgs.astype(np.float32), cfg["num_slice"],
                              cfg["num_x"], cfg["num_y"])
        imgs = pad2factor(imgs, factor=pad_factor, pad_value=cfg["pad_value"])[None]

        imgs, mask = keep_only_annotation_z_slices(imgs, mask)
        imgs, mask = crop(imgs, mask, cfg.get("crop_size", [256, 256]),
                          cfg.get("pad_value", -1024), 0)
        imgs = normalize(imgs, minimum=cfg["HU_range"][0], maximum=cfg["HU_range"][1])
        imgs, mask = imgs[0], mask[0]   # (D, H, W) each
        if self._vol_cache_max > 0:
            imgs.flags.writeable = False   # cache entries are shared views
            mask.flags.writeable = False
            self._vol_cache[key] = (imgs, mask)
            if len(self._vol_cache) > self._vol_cache_max:
                self._vol_cache.popitem(last=False)
        return imgs, mask

    # ------------------------------------------------------------------ sample
    def draw_supports(self, idx: int) -> List[int]:
        """Draw the support picks for episode ``idx`` from the stdlib RNG
        (few_shot_reader.py:255-283 sequence). Split out so callers can
        pre-draw ALL episodes from the shared seed — multi-host eval then
        sees identical support assignments on every process regardless of
        which strided shard it evaluates."""
        ci, di = self.indices[idx]
        pool = [i for i in range(len(self.data_info[ci])) if i != di]
        return random.choices(pool, k=self.cfg["n_shot"])

    def sample(self, idx: int, supp_idx: Optional[int] = None,
               picks: Optional[List[int]] = None) -> Episode:
        cfg = self.cfg
        ci, di = self.indices[idx]
        pid = self.data_info[ci][di]["pid"]

        if picks is None:
            picks = self.draw_supports(idx)
        if supp_idx is not None:
            picks = [supp_idx]
        supp_pids = [(ci, i) for i in picks]

        supports = [self.load_image_and_mask(self.data_info[ci][i]["pid"],
                                             self.classes[ci]) for i in picks]
        qry_img, qry_mask = self.load_image_and_mask(pid, self.classes[ci])

        if self.mode == "train":
            ep = self._assemble_train(supports, qry_img, qry_mask)
        else:
            ep = self._assemble_eval(supports, qry_img, qry_mask)
        return dataclasses.replace(ep, class_id=ci, pid=pid, supp_pids=supp_pids)

    def sample_spec(self, idx: int,
                    picks: Optional[List[int]] = None) -> Optional["EpisodeSpec"]:
        """Index-only twin of :meth:`sample` for the reference eval semantics
        (mode='eval', last-support-wins, single support volume). Returns
        ``None`` when the episode needs host assembly (train mode,
        use_all_supports/multishot, or mismatched crop shapes) — callers fall
        back to :meth:`sample`. Consumes the SAME support-draw RNG stream, so
        mixing spec and host paths preserves reproducibility."""
        cfg = self.cfg
        if (self.mode != "eval" or cfg.get("use_all_supports")
                or cfg.get("multishot_fusion")):
            return None
        ci, di = self.indices[idx]
        pid = self.data_info[ci][di]["pid"]
        if picks is None:
            picks = self.draw_supports(idx)
        roi = self.classes[ci]
        supp_pid = self.data_info[ci][picks[-1]]["pid"]   # last support wins
        s_img, _ = self.load_image_and_mask(supp_pid, roi)
        q_img, _ = self.load_image_and_mask(pid, roi)
        if s_img.shape[1:] != q_img.shape[1:]:
            return None
        nq = q_img.shape[0]
        test_shot = cfg.get("test_shot", cfg["n_shot"])
        k, supp_idx, edges = slice_bins([s_img.shape[0]], nq, cfg["k"])
        rows = np.zeros((test_shot, nq), np.int32)
        # the _assemble_eval repeat pattern as an index map
        # (few_shot_reader.py:516-545 test_shot offsets)
        for m in range(test_shot):
            for j in range(k):
                s, e = int(edges[j]), int(edges[j + 1])
                offset = 0 if j + m >= k else m
                rows[m, s:e] = int(supp_idx[0][j + offset])
        return EpisodeSpec((supp_pid, roi), (pid, roi), rows, nq, ci, pid,
                           [(ci, i) for i in picks])

    # .................................................................. eval
    def _assemble_eval(self, supports, qry_img, qry_mask) -> Episode:
        cfg = self.cfg
        test_shot = cfg.get("test_shot", cfg["n_shot"])
        use_all = bool(cfg.get("use_all_supports", False))
        # reference defect replicated: only last support volume survives the
        # loop (few_shot_reader.py:521-545) unless use_all_supports
        chosen = supports if use_all else supports[-1:]

        nq = qry_img.shape[0]
        k, supp_idx, edges = slice_bins([s[0].shape[0] for s in chosen], nq, cfg["k"])

        shot_imgs, shot_labs = [], []
        if use_all:
            # native multi-support: one shot per support VOLUME, each matched
            # to the query bins (feeds multishot_fusion in the pipeline)
            for i, (vol_img, vol_lab) in enumerate(chosen):
                img_rows, lab_rows = [], []
                for j in range(k):
                    s, e = int(edges[j]), int(edges[j + 1])
                    si = int(supp_idx[i][j])
                    img_rows.append(np.repeat(vol_img[si][None], e - s, axis=0))
                    lab_rows.append(np.repeat(vol_lab[si][None], e - s, axis=0))
                shot_imgs.append(np.concatenate(img_rows, axis=0))
                shot_labs.append(np.concatenate(lab_rows, axis=0))
        else:
            # reference semantics: slice-offset "shots" from the last support
            for m in range(test_shot):
                img_rows, lab_rows = [], []
                for j in range(k):
                    s, e = int(edges[j]), int(edges[j + 1])
                    offset = 0 if j + m >= k else m
                    si = int(supp_idx[0][j + offset])
                    img_rows.append(np.repeat(chosen[0][0][si][None], e - s, axis=0))
                    lab_rows.append(np.repeat(chosen[0][1][si][None], e - s, axis=0))
                shot_imgs.append(np.concatenate(img_rows, axis=0))
                shot_labs.append(np.concatenate(lab_rows, axis=0))
        support_images = np.stack(shot_imgs)       # (shots, Dq, H, W)
        support_labels = np.stack(shot_labs)

        support_images, support_labels, qry_img, qry_mask = _pad_same_hw(
            support_images, support_labels, qry_img, qry_mask)
        return Episode(support_images.astype(np.float32),
                       support_labels.astype(np.float32),
                       qry_img.astype(np.float32), qry_mask.astype(np.float32),
                       -1, "", [])

    # .................................................................. train
    def _assemble_train(self, supports, qry_img, qry_mask) -> Episode:
        cfg = self.cfg
        from rpnet_tpu.core.transforms import gamma_transform

        nq = qry_img.shape[0]
        k, supp_idx, edges = slice_bins([s[0].shape[0] for s in supports], nq, cfg["k"])

        s_img = np.stack([supports[i][0][supp_idx[i]] for i in range(len(supports))])
        s_lab = np.stack([supports[i][1][supp_idx[i]] for i in range(len(supports))])

        q_imgs, q_labs = [], []
        for j in range(k):
            s, e = int(edges[j]), int(edges[j + 1])
            ind = random.randint(s, max(e - 1, s))
            q = qry_img[ind]
            l = qry_mask[ind]
            if cfg["do_intaug"] and np.random.randint(2, size=1).item():
                q = gamma_transform(q, cfg.get("gamma_range", [0.5, 1.5]))
            q, l = random_affine_2d(q, l)
            q_imgs.append(q)
            q_labs.append(l)
        q_imgs = np.stack(q_imgs)
        q_labs = np.stack(q_labs)

        shuffle = np.arange(k)
        np.random.shuffle(shuffle)
        s_img = s_img[:, shuffle]
        s_lab = s_lab[:, shuffle]
        q_imgs = q_imgs[shuffle]
        q_labs = q_labs[shuffle]

        s_img_p, s_lab_p, q_imgs, q_labs = _pad_same_hw(s_img, s_lab, q_imgs, q_labs)
        return Episode(s_img_p.astype(np.float32), s_lab_p.astype(np.float32),
                       q_imgs.astype(np.float32), q_labs.astype(np.float32),
                       -1, "", [])


def _pad_same_hw(s_img, s_lab, q_img, q_lab):
    """Pad support & query to a common (H, W) (few_shot_reader.py:78-106)."""
    H = max(s_img.shape[-2], q_img.shape[-2])
    W = max(s_img.shape[-1], q_img.shape[-1])

    def pad_to(a, fill):
        pads = [(0, 0)] * (a.ndim - 2) + [(0, H - a.shape[-2]), (0, W - a.shape[-1])]
        return np.pad(a, pads, constant_values=fill)

    return (pad_to(s_img, s_img.min()), pad_to(s_lab, 0),
            pad_to(q_img, q_img.min()), pad_to(q_lab, 0))


def random_affine_2d(img: np.ndarray, label: np.ndarray,
                     degrees: float = 5.0, translate: float = 0.2,
                     scale_range=(0.7, 1.5)):
    """Train-time random affine (random_transform, few_shot_reader.py:27-47).

    torchvision RandomAffine semantics with nearest interpolation; empty
    (fill) pixels take the image minimum (few_shot_reader.py:44).
    """
    import cv2

    H, W = img.shape
    ang = np.random.uniform(-degrees, degrees)
    tx = np.random.uniform(-translate, translate) * W
    ty = np.random.uniform(-translate, translate) * H
    sc = np.random.uniform(*scale_range)
    M = cv2.getRotationMatrix2D((W / 2, H / 2), ang, sc)
    M[0, 2] += tx
    M[1, 2] += ty
    img01 = (img + 1) / 2
    warped = cv2.warpAffine(img01, M, (W, H), flags=cv2.INTER_NEAREST,
                            borderValue=0.0)
    lab = cv2.warpAffine(label, M, (W, H), flags=cv2.INTER_NEAREST,
                         borderValue=0.0)
    warped[warped == 0] = img01.min()
    return warped * 2 - 1, lab
