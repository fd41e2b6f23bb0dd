"""Per-part appearance pooling.

Method (SURVEY.md §2.1 "Per-part appearance pooling", [B:5], [PAPER]):

    a_k = Σ_u p_k(u) · f(u) / Σ_u p_k(u)

part-mask-weighted average of appearance-encoder features → K×C
appearance vectors. The localization masks p come from running the
SHAPE encoder on the spatially transformed view. Implemented as one
batched [B,K,HW] @ [B,HW,C] contraction (MXU).
"""

from __future__ import annotations

import chex
import jax
import jax.numpy as jnp


def pool_appearance(feats: jax.Array, parts: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Pool appearance features under part masks.

    Args:
      feats: [B, H, W, C] appearance-encoder features.
      parts: [B, H, W, K] nonnegative part weights (need not be
        normalized; the division below normalizes per part).

    Returns:
      [B, K, C] appearance vectors, f32.
    """
    chex.assert_rank((feats, parts), 4)
    chex.assert_equal_shape_prefix((feats, parts), 3)  # same B, H, W
    b, h, w, c = feats.shape
    k = parts.shape[-1]
    f = feats.astype(jnp.float32).reshape(b, h * w, c)
    p = parts.astype(jnp.float32).reshape(b, h * w, k)
    num = jnp.einsum("bnk,bnc->bkc", p, f, preferred_element_type=jnp.float32)
    den = jnp.sum(p, axis=1)[..., None]                        # [B, K, 1]
    return num / (den + eps)
