"""Parallelism building blocks beyond plain DP (SURVEY.md §2.3, §5.7)."""

from partseg_tpu.parallel.spatial import (
    halo_exchange,
    sharded_pool_appearance,
    sharded_render_gaussians,
    sharded_soft_argmax_moments,
    sharded_spatial_conv,
    sharded_spatial_softmax,
)

__all__ = [
    "halo_exchange",
    "sharded_pool_appearance",
    "sharded_render_gaussians",
    "sharded_soft_argmax_moments",
    "sharded_spatial_conv",
    "sharded_spatial_softmax",
]
