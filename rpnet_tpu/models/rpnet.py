"""RP_Net: few-shot segmentation with recurrent mask refinement.

TPU-native rebuild of `RP_Net` (net/rp_net.py:184-440):

  encoder → context-relation features (CRE) → masked-average-pool prototypes →
  cosine-distance prediction → recurrent refinement (``nn.scan``) →
  optional PANet alignment loss.

Key deviations from the reference implementation (same math, better program):
  * the refinement loop is a ``lax.scan`` (via nn.scan), not a Python loop
    (net/rp_net.py:281-312) — one compiled iteration body;
  * support prototypes are loop-invariant (supp features and masks don't change
    across iterations) and are hoisted OUT of the loop; the reference
    recomputes them every iteration (net/rp_net.py:287-297) — pure waste;
  * the final "output" pass (net/rp_net.py:320-337) is numerically identical
    to the last refinement iteration's logits — both evaluate the same
    prototypes against the same ``inter_qry_fts`` — so we return
    ``refinement[-1]`` as ``output`` instead of recomputing;
  * masked average pooling never upsamples features to image size
    (net/rp_net.py:373-375): we apply the exact transpose of the bilinear
    upsampler to the mask instead (ops/sampling.resize_transpose), which is
    mathematically identical and ~16× cheaper;
  * batch (episode) loop → vmap; ways/shots → vmapped axes.

Multi-shot note: the reference's relation mode crashes for n_shot>1 (it
indexes supp_fts[way, shot] on a [None, None]-broadcast CRE output,
net/rp_net.py:275,288). Here the CRE runs per (way, shot) support and
prototypes average over shots (getPrototype semantics, net/rp_net.py:379-391),
which reduces exactly to the reference at 1-way/1-shot and actually works for
the 5-shot eval config.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rpnet_tpu.models.cre import ContextCorrelationEncoder, SimpleConcat
from rpnet_tpu.models.resnet import ResNet18Encoder
from rpnet_tpu.models.unet import UNet
from rpnet_tpu.models.vgg import VGGEncoder
from rpnet_tpu.ops.sampling import (avg_pool2d, interpolate_bilinear,
                                    resize_transpose)

COSINE_EPS = 1e-8  # torch F.cosine_similarity default


def cosine_distance(fts, prototype, scaler: float = 20.0):
    """calDist (net/rp_net.py:353-363): cosine similarity × scaler.

    fts: (..., h, w, C); prototype: (..., C) broadcast over h, w.
    """
    proto = prototype[..., None, None, :]
    dot = jnp.sum(fts * proto, axis=-1)
    n1 = jnp.maximum(jnp.linalg.norm(fts, axis=-1), COSINE_EPS)
    n2 = jnp.maximum(jnp.linalg.norm(proto, axis=-1), COSINE_EPS)
    return dot / (n1 * n2) * scaler


def masked_average_pool(fts, mask):
    """getFeatures (net/rp_net.py:366-376) without the 16× upsample.

    fts: (h, w, C) feature map; mask: (H, W) full-resolution mask.
    sum(upsample(fts) * mask) == sum(fts * upsampleᵀ(mask)) exactly.

    The spatial sums ALWAYS accumulate in f32, even when the network runs
    bf16: a bf16 (h·w)-element reduction is sensitive to the reduction order
    GSPMD picks per sharding, which made 8-way-sharded eval flip knife-edge
    thresholded masks vs single-device eval (round-3 finding). f32 prototype
    accumulation is value-stable across shardings and costs nothing — the
    prototypes are (Wa, B, C).
    """
    h, w, _ = fts.shape
    m_down = resize_transpose(mask[None, :, :, None], (h, w))[0, :, :, 0]
    num = jnp.sum(fts.astype(jnp.float32) * m_down.astype(jnp.float32)[..., None],
                  axis=(0, 1))
    den = jnp.sum(mask.astype(jnp.float32)) + 1e-5
    return num / den


class RPNet(nn.Module):
    """Flagship few-shot segmentation model.

    Inputs (channels-last; Wa=ways, Sh=shots, B=slices-in-microbatch):
      supp_imgs:  (Wa, Sh, B, H, W, 1)
      fore_mask:  (Wa, Sh, B, H, W)
      back_mask:  (Wa, Sh, B, H, W)
      qry_imgs:   (B, H, W, 1)
      appr_query_labels: (B, H, W)  — the registration prior
    Returns {'output': (B, H, W, 1+Wa) logits, 'refinement': (T, B, H, W, 1+Wa),
             'align_loss': scalar (train only)}.
    """
    backbone: str = "UNet"            # vgg | UNet | resnet
    norm: str = "BatchNorm2d"
    mask_feature_map: str = "no"
    scale: int = 4                    # feature stride for mask pooling
    num_iter: int = 10                # refinement iterations
    radius: int = 5                   # correlation window radius
    soft_mask: bool = False
    use_relation_enc: str = "relation"
    align: bool = True
    dist_scaler: float = 20.0
    use_pallas: bool = True
    # XLA unroll factor for the refinement scan (`refinement_unroll` config
    # key). 1 = plain while loop; num_iter = fully unrolled (lets XLA fuse
    # across iterations at the cost of program size / compile time)
    refine_unroll: int = 1

    def setup(self):
        if self.backbone == "vgg":
            self.encoder = VGGEncoder(name="encoder")
        elif self.backbone == "UNet":
            self.encoder = UNet(norm=self.norm,
                                mask_feature_map=self.mask_feature_map,
                                name="encoder")
        elif self.backbone == "resnet":
            self.encoder = ResNet18Encoder(name="encoder")
        else:
            raise NotImplementedError(self.backbone)
        if self.use_relation_enc == "relation":
            self.cre = ContextCorrelationEncoder(radius=self.radius,
                                                 use_pallas=self.use_pallas,
                                                 name="cre")
        elif self.use_relation_enc == "concat":
            self.sim_cat = SimpleConcat(name="sim_cat")
        else:
            raise NotImplementedError(self.use_relation_enc)

    # ------------------------------------------------------------------
    def _encode(self, imgs, mask, train):
        """imgs (..., H, W, 1) → features (..., h, w, C)."""
        lead = imgs.shape[:-3]
        flat = imgs.reshape((-1,) + imgs.shape[-3:])
        if self.backbone in ("vgg", "resnet"):
            flat = jnp.broadcast_to(flat, flat.shape[:-1] + (3,))
            m = None
        else:
            m = mask.reshape((-1,) + mask.shape[-2:])[..., None] if mask is not None else None
        fts = self.encoder(flat, m, train)["d4"]
        return fts.reshape(lead + fts.shape[1:])

    def _relate(self, fts, mask_ds, train):
        """Apply the relation encoder. fts (B, h, w, C); mask_ds (B, h, w, 1)."""
        if self.use_relation_enc == "relation":
            return self.cre(fts * mask_ds, fts * (1.0 - mask_ds), train)
        return self.sim_cat(fts, mask_ds, train)

    def _prototypes(self, supp_fts, fore_mask, back_mask):
        """Masked-average-pool prototypes (net/rp_net.py:366-391).

        supp_fts: (Wa, Sh, B, h, w, C); masks: (Wa, Sh, B, H, W).
        Returns fg (Wa, B, C), bg (B, C).
        """
        pool = jax.vmap(jax.vmap(jax.vmap(masked_average_pool)))
        fg = pool(supp_fts, fore_mask)            # (Wa, Sh, B, C) — f32
        bg = pool(supp_fts, back_mask)
        fg_proto = jnp.mean(fg, axis=1)           # avg over shots → (Wa, B, C)
        bg_proto = jnp.mean(jnp.mean(bg, axis=1), axis=0)   # (B, C)
        # back to the network compute dtype only after all reductions
        return (fg_proto.astype(supp_fts.dtype),
                bg_proto.astype(supp_fts.dtype))

    def _predict(self, qry_fts, fg_proto, bg_proto, img_size):
        """Cosine distances vs prototypes → upsampled logits (B, H, W, 1+Wa)."""
        dist_bg = cosine_distance(qry_fts, bg_proto, self.dist_scaler)  # (B, h, w)
        dist_fg = jax.vmap(
            lambda p: cosine_distance(qry_fts, p, self.dist_scaler))(fg_proto)
        dists = jnp.concatenate([dist_bg[None], dist_fg], axis=0)       # (1+Wa, B, h, w)
        dists = jnp.moveaxis(dists, 0, -1)                              # (B, h, w, 1+Wa)
        return interpolate_bilinear(dists, img_size)

    # ------------------------------------------------------------------
    def __call__(self, supp_imgs, fore_mask, back_mask, qry_imgs,
                 appr_query_labels, train: bool = False):
        Wa, Sh = supp_imgs.shape[:2]
        H, W = qry_imgs.shape[-3:-1]

        if train:
            supp_fts_raw = self._encode(supp_imgs, fore_mask, train)  # (Wa,Sh,B,h,w,C)
            qry_fts = self._encode(qry_imgs, fore_mask[0, 0], train)  # (B,h,w,C)
        else:
            # eval: ONE batched encoder pass over support+query (frozen BN
            # stats are per-sample, so the merge is value-exact) — halves the
            # encoder dispatch count; the reference encodes the two stacks
            # separately (net/rp_net.py:245-262)
            B = qry_imgs.shape[0]
            imgs = jnp.concatenate(
                [supp_imgs.reshape((-1,) + supp_imgs.shape[2:]),
                 qry_imgs[None]], axis=0)           # (Wa*Sh+1, B, H, W, 1)
            masks = jnp.concatenate(
                [fore_mask.reshape((-1,) + fore_mask.shape[2:]),
                 fore_mask[0, 0][None]], axis=0)
            fts = self._encode(imgs, masks, train)  # (Wa*Sh+1, B, h, w, C)
            supp_fts_raw = fts[:-1].reshape((Wa, Sh) + fts.shape[1:])
            qry_fts = fts[-1]

        # registration prior enters as the initial query mask (rp_net.py:269-270)
        qry_mask = avg_pool2d(appr_query_labels[..., None], self.scale)
        flat_fm = fore_mask.reshape((-1,) + fore_mask.shape[3:])[..., None]
        supp_mask = avg_pool2d(flat_fm, self.scale)
        supp_mask = supp_mask.reshape((Wa, Sh, -1) + supp_mask.shape[1:])

        # relation-encode every support (way, shot); static tiny loops share
        # the CRE params (the reference only relates way0/shot0, rp_net.py:275)
        supp_fts = jnp.stack([
            jnp.stack([self._relate(supp_fts_raw[w_, s_], supp_mask[w_, s_], train)
                       for s_ in range(Sh)])
            for w_ in range(Wa)])

        fg_proto, bg_proto = self._prototypes(supp_fts, fore_mask, back_mask)

        # ---------------- refinement loop (lax.scan) ----------------
        def body(mdl, carry, _):
            qmask = carry
            inter = mdl._relate(qry_fts, qmask, train)            # (B,h,w,64)
            logits = mdl._predict(inter, fg_proto, bg_proto, (H, W))
            probs = jax.nn.softmax(logits, axis=-1)[..., 1]
            if not self.soft_mask:
                probs = (probs > 0.5).astype(logits.dtype)
            new_mask = avg_pool2d(probs[..., None], self.scale)
            return new_mask, (logits, inter)

        if train:
            # BN running stats mutate each iteration (torch semantics) → carry
            scan = nn.scan(body,
                           variable_broadcast="params",
                           variable_carry="batch_stats",
                           split_rngs={"params": False},
                           length=self.num_iter,
                           unroll=max(1, min(self.refine_unroll, self.num_iter)))
        else:
            scan = nn.scan(body,
                           variable_broadcast=["params", "batch_stats"],
                           split_rngs={"params": False},
                           length=self.num_iter,
                           unroll=max(1, min(self.refine_unroll, self.num_iter)))
        qry_mask, (refinement, inters) = scan(self, qry_mask, None)

        # final pass ≡ last refinement iteration (see module docstring)
        output = refinement[-1]
        last_inter = inters[-1]

        align_loss = jnp.asarray(0.0, output.dtype)
        if self.align and train:
            # use feature-resolution distances as `pred` (rp_net.py:335-343)
            h, w = last_inter.shape[1:3]
            dist_bg = cosine_distance(last_inter, bg_proto, self.dist_scaler)
            dist_fg = jax.vmap(lambda p: cosine_distance(last_inter, p,
                                                         self.dist_scaler))(fg_proto)
            pred_feat = jnp.moveaxis(
                jnp.concatenate([dist_bg[None], dist_fg], axis=0), 0, -1)
            align_loss = self.align_loss(last_inter, pred_feat, supp_fts,
                                         fore_mask, back_mask, train)

        return {"output": output, "refinement": refinement,
                "align_loss": align_loss, "inter_qry_fts": last_inter}

    # ------------------------------------------------------------------
    def align_loss(self, qry_fts, pred, supp_fts, fore_mask, back_mask, train):
        """PANet prototype-alignment loss (net/rp_net.py:394-440).

        qry_fts: (B, h, w, C); pred: (B, h, w, 1+Wa) feature-res distances;
        supp_fts: (Wa, Sh, B, h, w, C); masks (Wa, Sh, B, H, W).
        The reference's `skip_ways` (ways with zero predicted pixels) becomes a
        multiplicative indicator — identical value, jit-safe.
        """
        Wa, Sh = fore_mask.shape[:2]
        Hm, Wm = fore_mask.shape[-2:]
        pred_cls = jnp.argmax(pred, axis=-1)                      # (B, h, w)
        n_cls = 1 + Wa
        binary = jax.nn.one_hot(pred_cls, n_cls, axis=-1)          # (B, h, w, 1+Wa)
        # query prototypes per class over ALL query slices
        qsum = jnp.einsum("bhwc,bhwk->kc", qry_fts, binary)
        qcnt = jnp.sum(binary, axis=(0, 1, 2))                     # (1+Wa,)
        qry_protos = qsum / (qcnt[:, None] + 1e-5)                 # (1+Wa, C)
        way_present = (qcnt[1:] > 0).astype(qry_fts.dtype)         # (Wa,)

        def way_shot_loss(way, shot):
            fts = supp_fts[way, shot]                              # (B, h, w, C)
            d_bg = cosine_distance(fts, qry_protos[0][None], self.dist_scaler)
            d_fg = cosine_distance(fts, qry_protos[way + 1][None], self.dist_scaler)
            logits = jnp.stack([d_bg, d_fg], axis=-1)              # (B, h, w, 2)
            logits = interpolate_bilinear(logits, (Hm, Wm))
            fm = fore_mask[way, shot]
            bm = back_mask[way, shot]
            # supp_label: fg=1 then OVERWRITTEN bg=0 — bg wins on overlap
            # (net/rp_net.py:433-436 assigns fore first, back second)
            logp = jax.nn.log_softmax(logits, axis=-1)
            fg_w = fm * (1.0 - bm)
            ce = -(fg_w * logp[..., 1] + bm * logp[..., 0])
            valid = fg_w + bm
            return jnp.sum(ce) / jnp.maximum(jnp.sum(valid), 1.0)

        loss = 0.0
        for way in range(Wa):
            for shot in range(Sh):
                loss = loss + way_present[way] * way_shot_loss(way, shot) / (Sh * Wa)
        return loss
