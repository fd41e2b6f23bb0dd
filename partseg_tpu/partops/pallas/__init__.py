"""Fused Pallas TPU kernels for the hot compound part-ops.

Each kernel has a pure-jnp reference implementation in
partseg_tpu.partops (tested for parity in tests/partops/) and a
jax.custom_vjp. Off-TPU the kernels run in interpret mode so the full
suite stays hermetic on CPU (SURVEY.md §5.2).

Kernels (SURVEY.md §2.2):
  render_assemble — Gaussian blob render + Σ_k φ_k ⊗ a_k assembly in
    one pass; the [B, H, W, K] blob tensor never touches HBM.
  softmax_moments — per-part spatial softmax + soft-argmax μ/Σ moments
    in one VMEM pass over the logits.
"""

import jax


def use_interpret() -> bool:
    """Pallas interpret mode everywhere except real TPU backends."""
    return jax.default_backend() != "tpu"


from partseg_tpu.partops.pallas.render_assemble import render_assemble
from partseg_tpu.partops.pallas.softmax_moments import softmax_moments
from partseg_tpu.partops.pallas.bilinear_warp import (
    bilinear_sample_fused,
    tps_warp_fused,
)

__all__ = [
    "render_assemble",
    "softmax_moments",
    "bilinear_sample_fused",
    "tps_warp_fused",
    "use_interpret",
]
