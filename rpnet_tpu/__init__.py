"""rpnet_tpu — a TPU-native few-shot medical image segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of uci-cbcl/RP-Net
("Recurrent Mask Refinement for Few-Shot Medical Image Segmentation", ICCV'21):

  * classical differentiable registration (affine + demons) as compiled
    ``lax.fori_loop`` optimization, vmapped over query slices,
  * CNN encoders (U-Net / VGG16 / ResNet18) + PANet-style prototype matching,
  * a recurrent mask-refinement loop (context relation encoder with RAFT-style
    local correlation) rolled into ``lax.scan``,
  * an episodic eval/training driver where registration + network + Dice for a
    whole episode compile into one XLA program, sharded over a device mesh.

Layer map mirrors the reference (see SURVEY.md §1):
  core/          host+device transforms, NRRD IO, metrics, synthetic data
  ops/           sampling ops (grid_sample family), local correlation, Pallas kernels
  registration/  affine / demons / diffeomorphic / DEEDS registration
  models/        encoders, CRE, RP_Net, LGCANet_V3, loss zoo
  episode/       episodic sampler + fused episode pipeline
  parallel/      jax.sharding Mesh + sharding rules + collectives
  train/         optax training loop, orbax checkpoints, torch converter
  cli/           ``test_rpnet`` / ``train`` drivers (yaml-config interface)
"""

__version__ = "0.1.0"

from rpnet_tpu.config import Config, load_yaml  # noqa: F401
