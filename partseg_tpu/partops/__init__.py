"""L1 part ops: pure-jnp reference implementations + Pallas fused kernels.

Every op here is a pure function on arrays, NHWC layout, documented
against the method equations in SURVEY.md §2.1. The Pallas variants in
`partseg_tpu.partops.pallas` are drop-in replacements validated against
these reference implementations by tests/partops/.
"""

from partseg_tpu.partops.coords import coord_grid, moment_basis
from partseg_tpu.partops.softmax import part_softmax, spatial_softmax, normalize_maps
from partseg_tpu.partops.moments import (
    soft_argmax_moments,
    precision_from_cov,
    chol2x2,
)
from partseg_tpu.partops.render import render_gaussians
from partseg_tpu.partops.pooling import pool_appearance
from partseg_tpu.partops.assembly import assemble_decoder_input
from partseg_tpu.partops.warp import bilinear_sample, warp_image

__all__ = [
    "coord_grid",
    "moment_basis",
    "part_softmax",
    "spatial_softmax",
    "normalize_maps",
    "soft_argmax_moments",
    "precision_from_cov",
    "chol2x2",
    "render_gaussians",
    "pool_appearance",
    "assemble_decoder_input",
    "bilinear_sample",
    "warp_image",
]
