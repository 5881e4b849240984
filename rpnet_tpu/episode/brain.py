"""Brain MRI/CT volume dataset + elastic augmentation (rebuild of
dataset/brain_reader.py).

Non-few-shot volume reader used for the cross-modality generalization path
(BASELINE.json config 4): loads ``{pid}_clean.nrrd`` + per-ROI masks, crops
around the annotated region with jitter, HU-normalizes, optionally applies
Simard-style elastic augmentation, and converts masks to bounding boxes.

Host-side numpy/cv2/scipy — this is offline-ish data plumbing, not the
compiled compute path.
"""

from __future__ import annotations

import math
import os
from typing import Dict

import numpy as np

from rpnet_tpu.core import nrrd_io
from rpnet_tpu.core.boxes import annotation2masks, masks2bboxes_masks
from rpnet_tpu.core.transforms import normalize, pad2factor, truncate_image


def keep_only_annotation_region(img, mask, margin: int = 20):
    """Crop img+mask to the annotated bbox, with (h, w) margins
    (brain_reader.py:20-37: z gets no margin)."""
    c, d, h, w = mask.shape
    cc, dd, hh, ww = np.where(mask)
    d_min, d_max = dd.min(), dd.max()
    h_min = max(hh.min() - margin, 0)
    h_max = min(hh.max() + margin, h)
    w_min = max(ww.min() - margin, 0)
    w_max = min(ww.max() + margin, w)
    sel = (slice(d_min, d_max), slice(h_min, h_max), slice(w_min, w_max))
    if img.ndim == 3:
        return img[sel], mask[(slice(None),) + sel]
    return img[(slice(None),) + sel], mask[(slice(None),) + sel]


def elastic_transform(image, mask, alpha=1000, sigma=30, alpha_affine=0.04,
                      padding_value=-1.0, random_state=None):
    """Simard-style elastic deformation (brain_reader.py:248-294): random
    small affine (cv2.warpAffine) + Gaussian-smoothed random displacement
    (map_coordinates), applied slice-wise over z; masks nearest-neighbor."""
    import cv2
    from scipy.ndimage import gaussian_filter, map_coordinates

    if random_state is None:
        random_state = np.random.RandomState(None)

    shape_size = image.shape[2:]
    num_class, z = mask.shape[0], mask.shape[1]

    center_square = np.float32(shape_size) // 2
    square_size = min(shape_size) // 3
    pts1 = np.float32([center_square + square_size,
                       [center_square[0] + square_size,
                        center_square[1] - square_size],
                       center_square - square_size])
    pts2 = pts1 + random_state.uniform(-alpha_affine, alpha_affine,
                                       size=pts1.shape).astype(np.float32)
    M = cv2.getAffineTransform(pts1, pts2)

    dx = gaussian_filter(random_state.rand(*shape_size) * 2 - 1, sigma) * alpha
    dy = gaussian_filter(random_state.rand(*shape_size) * 2 - 1, sigma) * alpha
    xs, ys = np.meshgrid(np.arange(shape_size[1]), np.arange(shape_size[0]))
    indices = (np.reshape(ys + dy, (-1, 1)), np.reshape(xs + dx, (-1, 1)))

    new_img = np.zeros_like(image)
    new_mask = np.zeros_like(mask)
    for i in range(z):
        warped = cv2.warpAffine(image[0, i], M, shape_size[::-1],
                                borderMode=cv2.BORDER_CONSTANT,
                                borderValue=padding_value)
        new_img[0, i] = map_coordinates(warped, indices, order=1,
                                        mode="constant",
                                        cval=padding_value).reshape(shape_size)
        for j in range(num_class):
            if np.any(mask[j, i]):
                wm = cv2.warpAffine(mask[j, i], M, shape_size[::-1],
                                    flags=cv2.INTER_NEAREST,
                                    borderMode=cv2.BORDER_TRANSPARENT,
                                    borderValue=0)
                new_mask[j, i] = map_coordinates(wm, indices, order=0,
                                                 mode="constant").reshape(shape_size)
    return new_img, new_mask


def elastic_transform_all(image, mask, alpha=1000, sigma=30, alpha_affine=0.04,
                          padding_value=-1.0, random_state=None):
    """xy-plane elastic transform wrapper (brain_reader.py:208-245)."""
    return elastic_transform(image, mask, alpha, sigma, alpha_affine,
                             padding_value, random_state)


class Crop:
    """Center crop with jitter, limited by train_max_crop_size
    (brain_reader.py:297-358)."""

    def __init__(self, config):
        self.max_crop_size = config["train_max_crop_size"]
        self.pad_value = config["pad_value"]
        self.jitter = config["jitter_range"]

    def __call__(self, imgs, mask, do_jitter: bool = True):
        max_crop_size = self.max_crop_size
        img_crop_size = [int(math.ceil(d / 16.0) * 16) for d in imgs.shape[1:]]
        crop_size = [min(max_crop_size[i], img_crop_size[i]) for i in range(3)]
        target = np.array(imgs.shape[1:]) / 2 - np.array(crop_size) / 2

        start, shifts = [], []
        for i in range(3):
            if do_jitter:
                shift = np.random.randint(-self.jitter[i], self.jitter[i] + 1)
                s = target[i] + shift
                shifts.append(shift)
            else:
                s = target[i]
            start.append(int(min(s, imgs.shape[i + 1] - 1)))

        pad = [[0, 0]]
        for i in range(3):
            pad.append([max(0, -start[i]),
                        max(0, start[i] + crop_size[i] - imgs.shape[i + 1])])
        sel = tuple(slice(max(start[i], 0),
                          min(start[i] + crop_size[i], imgs.shape[i + 1]))
                    for i in range(3))
        crop = np.pad(imgs[(slice(None),) + sel], pad, "constant",
                      constant_values=self.pad_value)
        mask = np.pad(mask[(slice(None),) + sel], pad, "constant",
                      constant_values=0)
        return crop, mask, shifts


class BrainReader:
    """Volume dataset with train/eval/test modes (brain_reader.py:40-205).

    __getitem__ returns (train): [input (1,D,H,W), truth_bboxes, truth_labels,
    truth_masks, masks]; (eval) adds the original image and crop shifts.
    """

    def __init__(self, data_dir: str, set_name: str, config, mode: str = "train"):
        self.data_dir = data_dir
        self.mode = mode
        self.config = config
        if set_name.endswith(".csv"):
            names = np.genfromtxt(set_name, dtype=str, delimiter="\n")
            self.filenames = [str(n) for n in np.atleast_1d(names)]
        elif set_name.endswith(".npy"):
            self.filenames = [str(n) for n in np.load(set_name)]
        else:
            raise ValueError(set_name)
        self.crop = Crop(config)

    def __len__(self):
        return len(self.filenames)

    def _truncate(self, image):
        cfg = self.config
        return truncate_image(image, cfg["num_slice"], cfg["num_x"], cfg["num_y"])

    def load_mask(self, filename: str) -> np.ndarray:
        mask: Dict[str, np.ndarray] = {}
        for roi in self.config["roi_names"]:
            p = os.path.join(self.data_dir, f"{filename}_{roi}.nrrd")
            if os.path.isfile(p):
                m, _ = nrrd_io.read(p)
                if self.mode in ("train", "val", "eval"):
                    m = self._truncate(m)
                mask[roi] = m
        return annotation2masks(mask, roi_names=self.config["roi_names"])

    def __getitem__(self, idx: int):
        cfg = self.config
        filename = self.filenames[idx]

        if self.mode in ("train", "val", "eval"):
            mask = self.load_mask(filename).astype(np.float32)
            imgs, _ = nrrd_io.read(os.path.join(self.data_dir,
                                                f"{filename}_clean.nrrd"))
            imgs = self._truncate(imgs)[np.newaxis].astype(np.float32)
            imgs, mask = keep_only_annotation_region(imgs, mask)
            input_, masks, shifts = self.crop(imgs, mask, do_jitter=True)
            original_img = input_[0].copy()
            input_ = normalize(input_, minimum=cfg["HU_range"][0],
                               maximum=cfg["HU_range"][1])

            if (self.mode == "train" and cfg["do_elastic"]
                    and np.random.randint(2, size=1).item()):
                input_, masks = elastic_transform_all(input_, masks)

            bboxes, truth_masks = masks2bboxes_masks(masks,
                                                     border=cfg["bbox_border"])
            truth_masks = np.array(truth_masks).astype(np.uint8)
            bboxes = np.array(bboxes)
            truth_labels = bboxes[:, -1]
            truth_bboxes = bboxes[:, :-1]
            if self.mode == "eval":
                return [input_.astype(np.float32), truth_bboxes, truth_labels,
                        truth_masks, masks, original_img, shifts]
            return [input_.astype(np.float32), truth_bboxes, truth_labels,
                    truth_masks, masks]

        # test: whole padded volume, no labels
        imgs, _ = nrrd_io.read(os.path.join(self.data_dir,
                                            f"{filename}_clean.nrrd"))
        original_img = imgs.copy()
        imgs = pad2factor(imgs.astype(np.float32))[np.newaxis]
        input_ = normalize(imgs, minimum=cfg["HU_range"][0],
                           maximum=cfg["HU_range"][1])
        return [input_.astype(np.float32), original_img]
