"""L2 augmentation: on-device paired TPS warp + color jitter.

Unlike the reference — which samples TPS params per-sample on host CPU
workers and warps on GPU via grid_sample (SURVEY.md §1 L2) — the whole
stage here is a batched XLA region: params sampled with jax.random
inside jit, dense flow built by one matmul against a precomputed radial
basis, warping via partops.warp. The pairing of the two views (one rng
→ coupled x_s / x_a + transform params) is load-bearing for the
equivariance loss [B:5,8].
"""

from partseg_tpu.augment.tps import TPSSampler, TPSParams
from partseg_tpu.augment.color import color_jitter, sample_color_params
from partseg_tpu.augment.pair import AugmentConfig, make_pair

__all__ = [
    "TPSSampler",
    "TPSParams",
    "color_jitter",
    "sample_color_params",
    "AugmentConfig",
    "make_pair",
]
