"""Loss zoo (rebuild of the losses in net/rp_net.py:87-127 and net/unet.py:39-348).

All functions are channels-last and jit-safe. Dynamic-control-flow constructs
in the reference (per-bin Python loops in GHM, `g0.sum()==0` zeroing) become
vectorized masks with identical values.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def softmax_cross_entropy(logits, labels, ignore_index: Optional[int] = None):
    """torch F.cross_entropy on (B, H, W, C) logits / (B, H, W) int labels."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    if ignore_index is not None:
        valid = (labels != ignore_index)
        safe = jnp.where(valid, labels, 0)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def dice_loss_softmax(logits, true, eps: float = 1e-7):
    """Sørensen–Dice loss (dice_loss_softmax, net/rp_net.py:87-120).

    logits: (B, H, W, C); true: (B, H, W) integer labels.
    Multi-class path (C > 1): softmax probs vs one-hot, dice per class
    averaged. (The reference's C==1 sigmoid path is also provided.)
    """
    num_classes = logits.shape[-1]
    if num_classes == 1:
        pos = jax.nn.sigmoid(logits[..., 0])
        probas = jnp.stack([pos, 1.0 - pos], axis=-1)
        t = jax.nn.one_hot(true, 2)
        # reference swaps one-hot channels so fg aligns with sigmoid prob
        true_1_hot = jnp.stack([t[..., 1], t[..., 0]], axis=-1)
    else:
        probas = jax.nn.softmax(logits, axis=-1)
        true_1_hot = jax.nn.one_hot(true, num_classes)
    dims = (0, 1, 2)
    intersection = jnp.sum(probas * true_1_hot, axis=dims)
    cardinality = jnp.sum(probas + true_1_hot, axis=dims)
    dice = jnp.mean(2.0 * intersection / (cardinality + eps))
    return 1.0 - dice


def dice_ce(logits, true, eps: float = 1e-7):
    """dice + cross-entropy (dice_ce, net/rp_net.py:123-127) — the YAML
    default training loss (example.yml:115)."""
    return dice_loss_softmax(logits, true, eps) + softmax_cross_entropy(logits, true)


def dice_loss_per_class(pred, target):
    """Per-class sigmoid Tversky-style dice (dice_loss, net/unet.py:191-213).

    pred, target: (N, C). Returns (C,) per-class losses; classes with empty
    ground truth contribute 0.
    """
    p0 = jax.nn.sigmoid(pred)
    g0 = target
    num = jnp.sum(p0 * g0, axis=0)
    den = num + 0.5 * jnp.sum(p0 * (1 - g0), axis=0) + 0.5 * jnp.sum((1 - p0) * g0, axis=0)
    loss = 1.0 - num / (den + 1e-5)
    nonempty = (jnp.sum(g0, axis=0) > 0).astype(pred.dtype)
    return loss * nonempty


def binary_dice_loss(pred, target):
    """Foreground + background dice (binary_dice_loss, net/unet.py:216-249)."""
    p0 = jax.nn.sigmoid(pred)
    g0 = target
    num = jnp.sum(p0 * g0, axis=0)
    den = jnp.sum(p0, axis=0) + jnp.sum(g0, axis=0) + 1e-5
    loss_fore = 1.0 - num / (den + 1e-5)
    loss_back = -jnp.sum((1 - p0) * (1 - g0), axis=0) / (
        jnp.sum(1 - p0, axis=0) + jnp.sum(1 - g0, axis=0) + 1e-5)
    loss = loss_fore + loss_back
    nonempty = (jnp.sum(g0, axis=0) > 0).astype(pred.dtype)
    return loss * nonempty


def nll_neg_bootstrap_loss(p, g):
    """Bootstrapped negative log-likelihood (net/unet.py:341-348).

    NB the reference sigmoids its input a second time (its caller already
    applied sigmoid) — preserved."""
    p = jax.nn.sigmoid(p)
    return -jnp.mean((1 - g) * jnp.log(jnp.clip(1 - p, 1e-8)))


def dice_loss_bootstrap(pred, target):
    """dice + bootstrapped negative loss (net/unet.py:312-338)."""
    p0 = jax.nn.sigmoid(pred)
    g0 = target
    num = jnp.sum(p0 * g0, axis=0)
    den = num + 0.5 * jnp.sum(p0 * (1 - g0), axis=0) + 0.5 * jnp.sum((1 - p0) * g0, axis=0)
    dice = (1.0 - num / (den + 1e-5)) * (jnp.sum(g0, axis=0) > 0)
    neg = jax.vmap(nll_neg_bootstrap_loss, in_axes=1)(p0, g0)
    return dice + neg


def _ghm_bin_weights(g, valid, bins, dtype, momentum, acc_sum):
    """Shared GHM binning: gradient-length histogram → per-element weights.

    momentum>0 keeps an EMA of bin counts (net/unet.py:99-104): bins seen
    this step update ``acc = mmt*acc + (1-mmt)*count`` and weight by the
    UPDATED acc; unseen bins keep their old acc. Returns
    (weights, tot, new_acc_sum).
    """
    tot = jnp.maximum(jnp.sum(valid), 1.0)
    edges = jnp.arange(bins + 1, dtype=dtype) / bins
    edges = edges.at[-1].add(1e-6)
    idx = jnp.clip(jnp.searchsorted(edges, g, side="right") - 1, 0, bins - 1)
    counts = jnp.zeros((bins,), dtype).at[idx].add(valid.astype(dtype))
    n_valid_bins = jnp.sum(counts > 0)
    if momentum > 0:
        if acc_sum is None:
            acc_sum = jnp.zeros((bins,), dtype)
        new_acc = jnp.where(counts > 0,
                            momentum * acc_sum + (1 - momentum) * counts,
                            acc_sum)
        w_per_bin = jnp.where(counts > 0, tot / jnp.maximum(new_acc, 1e-12), 0.0)
    else:
        new_acc = acc_sum
        w_per_bin = jnp.where(counts > 0, tot / jnp.maximum(counts, 1.0), 0.0)
    weights = w_per_bin[idx] * valid / jnp.maximum(n_valid_bins, 1)
    return weights, tot, new_acc


def ghm_c_loss(pred, target, label_weight, bins: int = 10,
               loss_weight: float = 1.0, momentum: float = 0.0,
               acc_sum=None):
    """Gradient-harmonized BCE (GHMC, net/unet.py:39-111).

    pred/target/label_weight: broadcastable arrays (logits, binary target,
    validity). The per-bin Python loop becomes a vectorized histogram.
    With momentum>0 the EMA bin counts are CARRIED state (the reference
    mutates self.acc_sum): returns (loss, new_acc_sum) instead of loss —
    thread new_acc_sum into the next call.
    """
    pred = pred.reshape(-1)
    target = target.reshape(-1).astype(pred.dtype)
    valid = (label_weight.reshape(-1) > 0)
    g = jnp.abs(jax.nn.sigmoid(pred) - target)
    weights, tot, new_acc = _ghm_bin_weights(g, valid, bins, pred.dtype,
                                             momentum, acc_sum)

    bce = jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    loss = jnp.sum(bce * weights) / tot * loss_weight
    return (loss, new_acc) if momentum > 0 else loss


def ghm_dice_loss(pred, target, label_weight, bins: int = 10,
                  loss_weight: float = 1.0, momentum: float = 0.0,
                  acc_sum=None):
    """Gradient-harmonized dice (GHMDice, net/unet.py:114-188).

    momentum>0 carries EMA bin counts like :func:`ghm_c_loss` (returns
    (loss, new_acc_sum))."""
    pred = pred.reshape(-1)
    target = target.reshape(-1).astype(pred.dtype)
    valid = (label_weight.reshape(-1) > 0)
    I = jnp.sum(pred * target)
    S = jnp.sum(pred) + jnp.sum(target)
    g = jnp.abs(2 * I / S * jax.lax.stop_gradient(pred) - target)
    weights, tot, new_acc = _ghm_bin_weights(g, valid, bins, pred.dtype,
                                             momentum, acc_sum)

    loss = (1.0 - jnp.sum(2 * pred * target * weights) / S) * loss_weight
    return (loss, new_acc) if momentum > 0 else loss


# the reference's topk_dice_loss (net/unet.py:252-285) is a verbatim duplicate
# of binary_dice_loss (its topk_neg pruning is commented out) — aliased here
topk_dice_loss = binary_dice_loss


def topk_neg(pred, target, k: int = 5, base: int = 1000):
    """Hard-negative/positive selection (topk_neg, net/unet.py:288-309):
    keep the base*k highest-scoring negatives and base lowest positives.

    When fewer than base*k negatives (or base positives) exist, top_k would
    return sentinel-scored entries of the OPPOSITE label; the reference
    slices only available ones. Static shapes forbid slicing, so a validity
    weight masks the overflow entries instead: returns (pred, target,
    weight) with weight=0 on invalid selections.
    """
    pred = pred.reshape(-1)
    target = target.reshape(-1)
    neg_scores = jnp.where(target == 0, pred, -jnp.inf)
    pos_scores = jnp.where(target == 1, pred, jnp.inf)
    topk = int(base * k)
    neg_vals, neg_idx = jax.lax.top_k(neg_scores, min(topk, pred.shape[0]))
    pos_vals, pos_idx = jax.lax.top_k(-pos_scores, min(base, pred.shape[0]))
    keep = jnp.concatenate([pos_idx, neg_idx])
    valid = jnp.concatenate([jnp.isfinite(pos_vals), jnp.isfinite(neg_vals)])
    return pred[keep], target[keep], valid.astype(pred.dtype)


LOSS_REGISTRY = {
    "dice_ce": dice_ce,
    "dice_softmax": dice_loss_softmax,
    "dice": dice_loss_per_class,
    "binary_dice": binary_dice_loss,
    "dice_bootstrap": dice_loss_bootstrap,
    "ghm_c": ghm_c_loss,
    "ghm_dice": ghm_dice_loss,
}


def make_seg_loss(name: str):
    """Adapt any registry loss to the RP_Net training contract:
    (B, H, W, 2) softmax logits + (B, H, W) int labels → scalar.

    The per-class/binary losses (net/unet.py family) expect (N, C) sigmoid
    scores; for a 2-way softmax the equivalent binary logit is
    ``logits[..., 1] - logits[..., 0]`` (softmax₂ ≡ sigmoid of the
    difference). GHM losses get an all-ones validity weight (every pixel is
    labeled in this pipeline).
    """
    if name not in LOSS_REGISTRY and name is not None:
        # unknown name → graceful dice_ce fallback with the NATIVE softmax
        # contract (wrapping the fallback in the binary adapter below would
        # crash at trace time on the (N,1) score shapes)
        print(f"[loss {name!r} unknown — falling back to dice_ce]")
        return dice_ce
    fn = LOSS_REGISTRY.get(name, dice_ce)
    if name in ("dice_ce", "dice_softmax", None):
        return fn

    def adapted(logits, labels):
        score = (logits[..., 1] - logits[..., 0]).reshape(-1, 1)
        target = labels.astype(logits.dtype).reshape(-1, 1)
        if name in ("ghm_c", "ghm_dice"):
            pred = score[:, 0] if name == "ghm_c" else jax.nn.sigmoid(score[:, 0])
            return fn(pred, target[:, 0], jnp.ones_like(target[:, 0]))
        return jnp.sum(fn(score, target))        # per-class vector → scalar
    return adapted
