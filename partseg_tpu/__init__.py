"""partseg_tpu — TPU-native unsupervised part segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
CompVis/unsupervised-part-segmentation (Lorenz et al., CVPR 2019,
arXiv:1903.06946; Braun et al., GCPR 2020, arXiv:2009.04264):
unsupervised disentangling of object shape and appearance via
equivariance, yielding dense part segmentations and landmarks.

Layering (see SURVEY.md §1):
  partops/  — L1 tensor ops for parts (pure jnp + fused Pallas kernels)
  augment/  — L2 on-device paired TPS + color-jitter sampler
  models/   — L3 hourglass encoders + image decoder (Flax)
  losses/   — L4 VGG perceptual + equivariance losses
  data/     — L5 input pipelines (Grain + synthetic)
  train/    — L6 jit train step, config, checkpointing, CLI
  dist/     — device mesh / collectives helpers (DP over ICI)
  evals/    — L7 landmark regression + segmentation IoU evals
"""

__version__ = "0.1.0"
