"""AOT export of the fused episode program for serving (tpu-native add-on).

The reference has NO deployment story: inference is `test_rpnet.py`'s python
loop over a torch model (test_rpnet.py:147-238), so serving it means shipping
the whole training repo + torch. Here the entire episode program —
registration fit, network, refinement scan, metrics — is ONE jitted XLA
computation (episode/pipeline.py), so it can be exported with `jax.export`
into a self-contained StableHLO artifact and reloaded without the model
definition, the flax module tree, or any of this package's Python beyond
this loader.

Artifact layout (a directory):
  program.jaxexport   serialized `jax.export.Exported` (StableHLO + calling
                      convention; weights are INPUTS, not constants, so a
                      retrained checkpoint serves without re-export)
  manifest.json       shapes/dtypes/static config + provenance

Notes
  * Exports are lowered per platform; pass ``platforms=["tpu"]`` (default:
    current backend). The TPU lowering embeds the Pallas correlation kernel
    as a `tpu_custom_call` — that custom call has no ABI-stability guarantee
    across jaxlib major versions, so the exporter records the jax version in
    the manifest and the loader warns on mismatch.
  * Static shapes only (the episode program is bucketed anyway —
    episode/pipeline.py pads query slices to `slice_bucket`). One artifact
    per bucket size, same as the live runner's compile cache.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

FORMAT_VERSION = 1
_PROGRAM_FILE = "program.jaxexport"
_MANIFEST_FILE = "manifest.json"


def episode_arg_specs(variables, *, shots: int, slices: int, height: int,
                      width: int):
    """ShapeDtypeStruct pytree matching episode_metrics_fn's signature:
    (variables, supp_img (Sh,Dq,H,W), supp_lab, qry_img (Dq,H,W), qry_lab,
    slice_mask (Dq,))."""
    spec = lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
    f32 = jnp.float32
    var_specs = jax.tree_util.tree_map(spec, variables)
    sq = jax.ShapeDtypeStruct((shots, slices, height, width), f32)
    q = jax.ShapeDtypeStruct((slices, height, width), f32)
    m = jax.ShapeDtypeStruct((slices,), f32)
    return (var_specs, sq, sq, q, q, m)


def export_episode_program(model, variables, *, slices: int, height: int,
                           width: int, shots: int = 1,
                           affine_iters: int = 50, demons_iters: int = 0,
                           fit_scale: int = 4, sampler: str = "matmul",
                           compute_dtype=jnp.float32,
                           multishot: bool = False, n_way: int = 1,
                           use_registration: bool = True,
                           reg_lr: float = 0.01, reg_sigma: float = 2.0,
                           platforms: Optional[Sequence[str]] = None):
    """Lower + export the fused episode program; returns `jax.export.Exported`.

    `variables` is only read for its shape/dtype tree — weights are inputs
    of the exported computation. With ``compute_dtype=bfloat16`` the weight
    INPUTS stay float32 (any orbax checkpoint serves without casting) and
    the cast to the network dtype happens inside the exported program.
    """
    from jax import export as jexport

    from rpnet_tpu.episode.pipeline import episode_metrics_fn

    fn = episode_metrics_fn(model, affine_iters=affine_iters,
                            demons_iters=demons_iters, fit_scale=fit_scale,
                            sampler=sampler, multishot=multishot,
                            n_way=n_way, compute_dtype=compute_dtype,
                            use_registration=use_registration,
                            reg_lr=reg_lr, reg_sigma=reg_sigma)
    if jnp.dtype(compute_dtype) != jnp.float32:
        inner = fn

        def fn(variables, *episode_arrays):  # noqa: F811 — dtype-cast wrapper
            variables = jax.tree_util.tree_map(
                lambda x: x.astype(compute_dtype)
                if x.dtype == jnp.float32 else x, variables)
            return inner(variables, *episode_arrays)
    # the Pallas/Mosaic correlation lowering is a tpu_custom_call, which is
    # outside jax.export's stable-ABI custom-call list — opt in explicitly
    # (the manifest pins the jax version for the loader to check)
    checks = [jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")]
    specs = episode_arg_specs(variables, shots=shots, slices=slices,
                              height=height, width=width)
    return jexport.export(jax.jit(fn), platforms=platforms,
                          disabled_checks=checks)(*specs)


def save_artifact(exported, directory: str,
                  extra_manifest: Optional[Dict[str, Any]] = None) -> str:
    """Write `<directory>/{program.jaxexport,manifest.json}`; returns the dir."""
    os.makedirs(directory, exist_ok=True)
    blob = exported.serialize()
    with open(os.path.join(directory, _PROGRAM_FILE), "wb") as f:
        f.write(blob)
    manifest = {
        "format_version": FORMAT_VERSION,
        "fn_name": exported.fun_name,
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "nr_devices": exported.nr_devices,
    }
    manifest.update(extra_manifest or {})
    with open(os.path.join(directory, _MANIFEST_FILE), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return directory


class ServingProgram:
    """A reloaded artifact: call it like the live jitted episode function."""

    def __init__(self, exported, manifest: Dict[str, Any]):
        self.exported = exported
        self.manifest = manifest
        self._call = jax.jit(exported.call)

    def __call__(self, variables, *episode_arrays):
        return self._call(variables, *episode_arrays)


def load_artifact(directory: str, check_version: bool = True) -> ServingProgram:
    """Deserialize an artifact directory written by `save_artifact`."""
    from jax import export as jexport

    prog_path = os.path.join(directory, _PROGRAM_FILE)
    man_path = os.path.join(directory, _MANIFEST_FILE)
    if not os.path.exists(prog_path):
        raise FileNotFoundError(f"no {_PROGRAM_FILE} in {directory}")
    manifest: Dict[str, Any] = {}
    if os.path.exists(man_path):
        with open(man_path) as f:
            manifest = json.load(f)
    if check_version and manifest:
        fv = manifest.get("format_version")
        if fv is not None and fv > FORMAT_VERSION:
            raise ValueError(f"artifact format {fv} is newer than this "
                             f"loader ({FORMAT_VERSION})")
        jv = manifest.get("jax_version")
        if jv and jv.split(".")[0] != jax.__version__.split(".")[0]:
            import warnings
            warnings.warn(
                f"artifact was exported with jax {jv}, running {jax.__version__}"
                " — tpu_custom_call ABI is not guaranteed across major versions",
                stacklevel=2)
    with open(prog_path, "rb") as f:
        blob = f.read()
    return ServingProgram(jexport.deserialize(blob), manifest)


def make_artifact_runner(program: ServingProgram, variables, config):
    """An EpisodeRunner driven by a RELOADED artifact — no model built.

    Shares the live runner's pad/dispatch/finalize, so
    `cli.test_rpnet.run_eval_protocol` — per-episode fault isolation,
    n_runs aggregation, results JSON — runs unchanged on a serving artifact
    + a raw orbax checkpoint tree. The exported program's shapes are
    static: the slice bucket is pinned to the artifact's ``slices`` (one
    bucket; longer volumes truncate, exactly like a live runner with
    max_slices == bucket), and label inputs stay f32 (the exported calling
    convention — compact uint8 transfer is a live-runner optimization the
    artifact's avals don't carry).
    """
    from rpnet_tpu.episode.pipeline import EpisodeRunner

    class ArtifactRunner(EpisodeRunner):
        # host-side contract inherited; only construction differs (no model,
        # no jit — the deserialized program IS the callable)
        def __init__(self):   # noqa: D401 — deliberate non-super init
            man = program.manifest
            slices = int(man.get("slices")
                         or program.exported.in_avals[-1].shape[0])
            self.cfg = config
            self.mesh = None
            self.compact_transfer = False
            self.bucket = slices
            self.max_slices = slices
            self.variables = jax.device_put(variables)
            self._jitted = program

    return ArtifactRunner()
