"""The fused episode program: registration + network + metrics in ONE jit.

This is the core TPU redesign (SURVEY.md §3.2/§3.3 → §7): the reference runs
per-slice registration fits on the data-loader thread (few_shot_reader.py:
122-185), then micro-batches query slices 2-at-a-time through the network
(test_rpnet.py:164,189-205), with host↔device copies at every boundary. Here
a whole episode — 50-iteration affine fit vmapped over slices, demons,
encoder, `lax.scan` refinement, Dice/NCC — compiles into a single XLA program
with static shapes.

Static shapes: the query-slice count varies per episode, so episodes are
padded to a multiple of ``slice_bucket`` with a validity mask (SURVEY.md §7
hard part 3); metrics are mask-weighted so padded slices can't leak into Dice.
One compiled program per bucket size, cached.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rpnet_tpu.core.metrics import dice_jax, ncc
from rpnet_tpu.episode.sampler import Episode
from rpnet_tpu.registration.fit import register_episode


def episode_metrics_fn(model, affine_iters: int, demons_iters: int,
                       fit_scale: int = 1, sampler: str = "matmul",
                       multishot: bool = False,
                       compute_dtype=jnp.float32,
                       use_registration: bool = True,
                       n_way: int = 1,
                       reg_lr: float = 0.01, reg_sigma: float = 2.0):
    """Build the pure episode function for `model` (un-jitted).

    ``multishot=False`` (default) reproduces the reference: only shot 0 is
    registered and fed to the network (the eval reader effectively discards
    the other shots, few_shot_reader.py:521-548). ``multishot=True`` is the
    native multi-support mode (BASELINE config 3): EVERY shot registers onto
    the query, all warped supports feed the model's shot axis (prototypes
    average over shots, net/rp_net.py:379-391 semantics), and the
    registration prior is the mean of the per-shot warped labels > 0.5.

    ``compute_dtype=bfloat16`` runs the NETWORK stage in bf16 (params are
    cast by the runner; inputs cast here) — halves activation HBM traffic and
    doubles MXU rate. Registration (stage 1) and metrics (stage 3) always stay
    float32: the Adam fit and Dice thresholds are precision-sensitive.
    """

    def fn(variables, supp_img, supp_lab, qry_img, qry_lab, slice_mask):
        """supp_img/supp_lab: (Sh, Dq, H, W); qry_*: (Dq, H, W); mask: (Dq,)."""
        Sh = supp_img.shape[0]
        if not use_registration:
            # use_registration_loss: False — skip registration entirely; raw
            # support image/label feed the network and the prior is the raw
            # support label. NOTE: the reference CRASHES here —
            # FewshotRegReader indexes affine_reg_pred[:, 0] which the
            # use_registration_loss=False branch sets to None
            # (few_shot_reader.py:556-565 → :605-608); this is the sensible
            # lift of those semantics.
            appr = supp_lab[0]
            supp_t = supp_img[0][None, None, ..., None]
            fore_t = supp_lab[0][None, None]
            reg_warped_src = supp_img[0]
        elif multishot and Sh > 1:
            regs = jax.vmap(lambda s, l: register_episode(
                s, qry_img, l, affine_iters=affine_iters,
                demons_iters=demons_iters, lr=reg_lr, sigma=reg_sigma,
                fit_scale=fit_scale, sampler=sampler))(supp_img, supp_lab)
            appr = (jnp.mean(regs.warped_label, axis=0) > 0.5).astype(jnp.float32)
            supp_t = regs.affine_src[None, ..., None]   # (1, Sh, Dq, H, W, 1)
            fore_t = regs.affine_label[None]            # (1, Sh, Dq, H, W)
            reg_warped_src = regs.warped_src[0]
        else:
            # ---- reference path: shot 0 only ----
            reg = register_episode(supp_img[0], qry_img, supp_lab[0],
                                   affine_iters=affine_iters,
                                   demons_iters=demons_iters,
                                   lr=reg_lr, sigma=reg_sigma,
                                   fit_scale=fit_scale, sampler=sampler)
            appr = reg.warped_label                     # (Dq, H, W)
            supp_t = reg.affine_src[None, None, ..., None]
            fore_t = reg.affine_label[None, None]
            reg_warped_src = reg.warped_src

        if n_way > 1:
            # reference n_way semantics: ways REPLICATE the sampled supports
            # (few_shot_reader.py:294-298 builds n_ways copies of the same
            # samples). Replication is NOT a no-op downstream — the final
            # softmax runs over 1+n_way channels (rp_net.py:305-310), so the
            # fg probability differs from 1-way; tile to match.
            supp_t = jnp.tile(supp_t, (n_way,) + (1,) * (supp_t.ndim - 1))
            fore_t = jnp.tile(fore_t, (n_way,) + (1,) * (fore_t.ndim - 1))

        # ---- stage 2: network ----
        back_t = 1.0 - fore_t
        qry_t = qry_img[..., None]
        cast = lambda a: a.astype(compute_dtype)
        out = model.apply(variables, cast(supp_t), cast(fore_t), cast(back_t),
                          cast(qry_t), cast(appr), train=False)
        refinement = out["refinement"].astype(jnp.float32)
        ref_probs = jax.nn.softmax(refinement, axis=-1)[..., 1]  # (T,Dq,H,W)
        ref_preds = (ref_probs > 0.5).astype(jnp.float32)
        fewshot_pred = ref_preds[-1]

        # ---- stage 3: on-device metrics ----
        w = slice_mask
        dsc_affine, affine_valid = dice_jax(appr, qry_lab, weight=w)
        dsc_fewshot, _ = dice_jax(fewshot_pred, qry_lab, weight=w)
        dsc_ref, _ = jax.vmap(lambda p: dice_jax(p, qry_lab, weight=w))(ref_preds)

        # NCC diagnostics (test_rpnet.py:229-230) over valid slices only —
        # mask-weighted statistics so slice-bucket padding doesn't bias them
        w3 = w[:, None, None]
        ncc_warped = ncc(reg_warped_src, qry_img, weight=w3)
        ncc_raw = ncc(supp_img[0], qry_img, weight=w3)

        return {
            "dsc_affine": dsc_affine,
            "dsc_fewshot": dsc_fewshot,
            "dsc_refinement": dsc_ref,          # (T,)
            "gt_nonempty": affine_valid,
            "ncc_warped": ncc_warped,
            "ncc_raw": ncc_raw,
            # all scalar metrics in ONE vector: the eval driver fetches this
            # single array instead of 6 separate device→host transfers (each
            # transfer is a full RTT on a tunneled TPU — ~170 ms/episode of
            # pure latency at 6 round trips)
            "packed_metrics": jnp.concatenate([
                jnp.stack([dsc_affine, dsc_fewshot,
                           affine_valid.astype(jnp.float32),
                           ncc_warped, ncc_raw]), dsc_ref]),
            "prediction": fewshot_pred,
            "appr_label": appr,
        }

    return fn


def _compact_labels(a: np.ndarray) -> np.ndarray:
    """uint8 twin of a {0,1}-valued float label array (4× smaller transfer
    through a tunneled TPU backend; widened back to f32 on device — exact).
    Non-binary labels (e.g. soft masks) pass through unchanged."""
    if a.dtype == np.float32:
        u8 = a.astype(np.uint8)
        if np.array_equal(u8, a):   # exactly {0, 1} (or small ints)
            return u8
    return a


class EpisodeRunner:
    """Pads episodes to bucketed static shapes and runs the fused program.

    With ``mesh`` given, the query-slice axis shards over the mesh's ``data``
    axis (this workload's sequence-parallel analogue, SURVEY.md §5): each chip
    registers + encodes + refines its slice shard; only the Dice/NCC
    reductions cross chips (GSPMD-inserted psums over ICI). The slice bucket
    rounds up to a multiple of the data-axis size so shards stay equal.
    """

    def __init__(self, model, variables, config, donate: bool = False,
                 mesh=None):
        self.model = model
        self.cfg = config
        self.mesh = mesh
        self.compact_transfer = True   # {0,1} labels go up as uint8
        self.bucket = int(config.get("slice_bucket", 32))
        self.max_slices = int(config.get("max_slices", 288))
        affine_iters = int(config.get("reg_affine_iters", 50))
        demons_iters = (int(config.get("reg_demons_iters", 50))
                        if config.get("do_deformable", False) else 0)
        fit_scale = int(config.get("reg_fit_scale", 1))
        sampler = str(config.get("reg_sampler", "matmul"))
        multishot = bool(config.get("multishot_fusion", False))
        use_registration = bool(config.get("use_registration_loss", True))
        # eval default is bf16 (round-3 A/B: +5% eps/s; ≤0.004 dice delta
        # at 10 iterations on a trained 256² checkpoint, affine identical —
        # docs/perf_trace_r3.md); explicit compute_dtype pins it (golden
        # tests: f32)
        compute_dtype = jnp.dtype(config.get("compute_dtype") or "bfloat16")
        if compute_dtype != jnp.float32:
            # cast params once; BN stats/scales in bf16 are standard inference
            # practice (registration + metrics remain f32 inside the fn)
            variables = jax.tree_util.tree_map(
                lambda x: x.astype(compute_dtype)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                variables)
        base_fn = episode_metrics_fn(model, affine_iters, demons_iters,
                                     fit_scale, sampler, multishot,
                                     compute_dtype,
                                     use_registration=use_registration,
                                     n_way=int(config.get("n_way", 1)),
                                     reg_lr=float(config.get("reg_lr", 0.01)),
                                     reg_sigma=float(config.get("reg_sigma", 2.0)))

        def fn(variables, supp_img, supp_lab, qry_img, qry_lab, mask):
            # labels may arrive uint8 (compact transfer, see dispatch) —
            # widen on device; bit-exact since the values are exactly {0, 1}
            return base_fn(variables, supp_img,
                           supp_lab.astype(jnp.float32), qry_img,
                           qry_lab.astype(jnp.float32), mask)

        # device-resident volume cache (eval fast path): (pid, roi) volumes
        # upload ONCE, episodes assemble on device by row gather — see
        # EpisodeSpec. LRU-bounded; `device_volume_cache: 0` disables.
        self._dev_vols: "OrderedDict[Tuple[str, str], Tuple]" = OrderedDict()
        self._dev_vols_max = int(config.get("device_volume_cache", 16))
        self.supports_spec = self._dev_vols_max > 0
        self._vol_sharding = None

        # the gather is its OWN tiny jit (pure row take, compiles in <1 s):
        # its shapes vary per (volume depth, bucket) pair, while the
        # expensive episode program keeps compiling per BUCKET only (shared
        # with the host path and the persistent compile cache) — assembled
        # episodes flow device-to-device into self._jitted
        def gather_fn(sv, sl, qv, ql, sidx, qidx):
            return (jnp.take(sv, sidx, axis=0),      # (Sh, P, H, W)
                    jnp.take(sl, sidx, axis=0),      # uint8 — fn widens
                    jnp.take(qv, qidx, axis=0),
                    jnp.take(ql, qidx, axis=0))

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_data = mesh.shape["data"]
            self.bucket = -(-self.bucket // n_data) * n_data
            self.max_slices = -(-self.max_slices // n_data) * n_data
            rep = NamedSharding(mesh, P())
            sl0 = NamedSharding(mesh, P("data"))                 # (Dq, H, W)
            sl1 = NamedSharding(mesh, P(None, "data"))           # (Sh, Dq, H, W)
            var_sh = jax.tree_util.tree_map(lambda _: rep, variables)
            self._in_shardings = (var_sh, sl1, sl1, sl0, sl0, sl0)
            self._jitted = jax.jit(fn, in_shardings=self._in_shardings)
            self.variables = jax.device_put(variables, var_sh)
            # sharded spec path: volumes replicate across the mesh (each
            # chip's gather is local), the gather OUTPUT shards exactly like
            # the main program's inputs so episodes flow device-to-device
            # with no resharding
            self._vol_sharding = rep
            self._jitted_gather = jax.jit(
                gather_fn, in_shardings=(rep,) * 6,
                out_shardings=(sl1, sl1, sl0, sl0))
        else:
            # COMMIT the weights to the device once: checkpoint restore hands
            # back numpy leaves, and numpy-leaf jit arguments re-upload the
            # whole tree on EVERY call — on a tunneled TPU that cost ~1 s per
            # episode (13× the program itself; round-3 finding, the mesh
            # branch's device_put never had this bug)
            self.variables = jax.device_put(variables)
            self._jitted = jax.jit(fn)
            self._jitted_gather = jax.jit(gather_fn)

    def pad(self, ep: Episode):
        Dq = ep.n_slices
        padded = min(-(-Dq // self.bucket) * self.bucket, self.max_slices)
        take = min(Dq, padded)

        def pad_slices(a, fill):
            a = a[..., :take, :, :]   # slice axis is third-from-last
            pads = [(0, 0)] * (a.ndim - 3) + [(0, padded - take), (0, 0), (0, 0)]
            return np.pad(a, pads, constant_values=fill)

        compact = (_compact_labels if getattr(self, "compact_transfer", True)
                   else lambda a: a)   # exported artifacts pin f32 inputs
        supp_img = pad_slices(ep.support_images, -1.0)
        supp_lab = compact(pad_slices(ep.support_labels, 0.0))
        qry_img = pad_slices(ep.query_images, -1.0)
        qry_lab = compact(pad_slices(ep.query_labels, 0.0))
        mask = np.zeros((padded,), np.float32)
        mask[:take] = 1.0
        return supp_img, supp_lab, qry_img, qry_lab, mask

    def _device_volume(self, sampler, key):
        """(pid, roi) → device-resident (img f32, lab uint8) pair, slice axis
        padded to a multiple of 32 (bounded set of compile shapes)."""
        hit = self._dev_vols.get(key)
        if hit is not None:
            self._dev_vols.move_to_end(key)
            return hit
        img, lab = sampler.load_image_and_mask(*key)
        D = img.shape[0]
        Dv = -(-D // 32) * 32
        img_p = np.full((Dv,) + img.shape[1:], -1.0, np.float32)
        img_p[:D] = img
        lab_p = np.zeros((Dv,) + lab.shape[1:], np.uint8)
        lab_p[:D] = lab          # labels are exactly {0, 1} — uint8 is exact
        pair = (jax.device_put(img_p, self._vol_sharding),
                jax.device_put(lab_p, self._vol_sharding))
        self._dev_vols[key] = pair
        if len(self._dev_vols) > self._dev_vols_max:
            self._dev_vols.popitem(last=False)
        return pair

    def dispatch_spec(self, spec, sampler):
        """Queue an EpisodeSpec episode: volumes from the device cache, slice
        assembly as an in-program row gather. Host→device traffic per episode
        is the index vectors (~KB) instead of the assembled slices (~13 MB at
        256²/bucket 24 — measured 75 ms/episode of tunnel upload, the
        dominant warm-CLI cost before this path; docs/perf_trace_r4.md)."""
        Dq = spec.n_slices
        padded = min(-(-Dq // self.bucket) * self.bucket, self.max_slices)
        take = min(Dq, padded)
        sidx = np.zeros((spec.supp_rows.shape[0], padded), np.int32)
        sidx[:, :take] = spec.supp_rows[:, :take]
        qidx = np.zeros((padded,), np.int32)
        qidx[:take] = (spec.qry_rows[:take]
                       if getattr(spec, "qry_rows", None) is not None
                       else np.arange(take, dtype=np.int32))
        mask = np.zeros((padded,), np.float32)
        mask[:take] = 1.0
        sv, sl = self._device_volume(sampler, spec.supp_key)
        qv, ql = self._device_volume(sampler, spec.qry_key)
        supp_img, supp_lab, qry_img, qry_lab = self._jitted_gather(
            sv, sl, qv, ql, jnp.asarray(sidx), jnp.asarray(qidx))
        return self._jitted(self.variables, supp_img, supp_lab,
                            qry_img, qry_lab, jnp.asarray(mask))

    def dispatch(self, ep: Episode):
        """Queue the episode program WITHOUT blocking (jax async dispatch).

        Returns the device-array output tree; pair with :meth:`finalize`.
        Splitting dispatch/finalize lets the eval driver software-pipeline
        episodes — assemble + queue episode j+1 while the device still
        computes episode j — hiding host-side fetch/print/assembly time.
        """
        supp_img, supp_lab, qry_img, qry_lab, mask = self.pad(ep)
        return self._jitted(self.variables, jnp.asarray(supp_img),
                            jnp.asarray(supp_lab), jnp.asarray(qry_img),
                            jnp.asarray(qry_lab), jnp.asarray(mask))

    def finalize(self, out, ep: Episode, arrays: bool = True) -> Dict[str, Any]:
        """Fetch results (blocks) and apply host conventions.

        ``arrays=False`` skips the (Dq, H, W) prediction / appr_label
        device→host transfers — the episodic eval driver only consumes the
        scalar metrics, and on a tunneled TPU backend those two arrays are
        ~16 MB/episode of dead weight.
        """
        packed = np.asarray(out["packed_metrics"])   # ONE device→host RTT
        # host conventions: None for empty ground truth (util.py:388-389)
        nonempty = bool(packed[2] > 0.5)
        result = {
            "dsc_affine": float(packed[0]) if nonempty else None,
            "dsc_fewshot": float(packed[1]) if nonempty else None,
            "dsc_refinement": {i: (float(v) if nonempty else None)
                               for i, v in enumerate(packed[5:])},
            "ncc_warped": float(packed[3]),
            "ncc_raw": float(packed[4]),
            "n_slices": ep.n_slices,
        }
        if arrays:
            result["prediction"] = np.asarray(out["prediction"])
            result["appr_label"] = np.asarray(out["appr_label"])
        return result

    def run(self, ep: Episode) -> Dict[str, Any]:
        return self.finalize(self.dispatch(ep), ep)
