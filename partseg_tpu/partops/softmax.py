"""Part-map normalizations.

Two distinct normalizations are used by the method (SURVEY.md §2.1
"Part-softmax normalization", [B:5], [PAPER]):

  (a) ``part_softmax`` — per-PIXEL softmax across the K parts (plus an
      optional background channel): yields a dense soft part
      segmentation; argmax over parts is the GCPR'20 segmentation.
  (b) ``spatial_softmax`` / ``normalize_maps`` — per-PART normalization
      over the H×W pixels: yields a probability distribution over image
      locations used for soft-argmax moment extraction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def part_softmax(logits: jax.Array, axis: int = -1) -> jax.Array:
    """Per-pixel softmax across parts. logits: [..., H, W, K] (NHWC)."""
    return jax.nn.softmax(logits, axis=axis)


def spatial_softmax(logits: jax.Array) -> jax.Array:
    """Per-part softmax over spatial locations.

    logits: [B, H, W, K] → probabilities with sum over (H, W) == 1 for
    every (batch, part). Computed in f32 for stability regardless of
    input dtype (bf16 models; see SURVEY.md §7.4 risk 5).
    """
    b, h, w, k = logits.shape
    x = logits.astype(jnp.float32).reshape(b, h * w, k)
    x = jax.nn.softmax(x, axis=1)
    return x.reshape(b, h, w, k)


def normalize_maps(maps: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Per-part division by the spatial sum (for nonnegative activations).

    maps: [B, H, W, K] nonnegative → distribution over pixels per part.
    The alternative to spatial_softmax kept as a config knob (the exact
    reference choice is ambiguous; SURVEY.md §7.4 risk 1).
    """
    m = maps.astype(jnp.float32)
    denom = jnp.sum(m, axis=(1, 2), keepdims=True)
    return m / (denom + eps)
