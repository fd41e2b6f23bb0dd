"""Decoder input assembly: Σ_k φ_k(u) ⊗ a_k.

Method (SURVEY.md §2.1 "Decoder input assembly", [B:8,10], [PAPER]):
outer product of each rendered blob with its appearance vector, summed
over parts, per decoder resolution. The appearance-swap / transfer path
simply passes a_k pooled from a different image (SURVEY.md §3.4).

Implemented as one batched [B,HW,K] @ [B,K,C] matmul — the K-part
accumulation never materializes a [B,H,W,K,C] tensor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def assemble_decoder_input(blobs: jax.Array, appearance: jax.Array) -> jax.Array:
    """Combine rendered blobs with appearance vectors.

    Args:
      blobs:      [B, H, W, K] rendered part maps (render.render_gaussians).
      appearance: [B, K, C] per-part appearance vectors (pooling).

    Returns:
      [B, H, W, C] decoder input features (dtype follows `appearance`).
    """
    b, h, w, k = blobs.shape
    c = appearance.shape[-1]
    phi = blobs.reshape(b, h * w, k)
    out = jnp.einsum(
        "bnk,bkc->bnc", phi, appearance.astype(blobs.dtype),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, h, w, c).astype(appearance.dtype)
