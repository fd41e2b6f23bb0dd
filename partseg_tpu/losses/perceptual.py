"""Perceptual reconstruction loss.

L_rec = Σ_l λ_l ‖φ_l(x̂) − φ_l(x)‖₁ + λ_pix ‖x̂ − x‖₁
(SURVEY.md §2.1 "VGG19 perceptual loss" [B:5][PAPER]). VGG features for
x̂ and x are computed in ONE batched forward (stacked along batch) so
the conv work stays in large MXU-friendly batches.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp

from partseg_tpu.losses.vgg import VGG19Features


class PerceptualLoss:
    """Callable: (x_hat, x) → scalar f32. Holds frozen VGG params."""

    def __init__(
        self,
        vgg_params: Any,
        extract: Sequence[str] = ("relu1_2", "relu2_2", "relu3_2", "relu4_2"),
        layer_weights: Sequence[float] | None = None,
        pixel_weight: float = 1.0,
        trim_blocks: int = 5,
        dtype: Any = jnp.bfloat16,
    ):
        self.model = VGG19Features(extract=tuple(extract), trim_blocks=trim_blocks, dtype=dtype)
        self.params = vgg_params
        self.extract = tuple(extract)
        self.layer_weights = (
            tuple(layer_weights) if layer_weights is not None else (1.0,) * len(extract)
        )
        self.pixel_weight = pixel_weight

    def __call__(self, x_hat: jax.Array, x: jax.Array) -> jax.Array:
        both = jnp.concatenate([x_hat, x.astype(x_hat.dtype)], axis=0)
        feats = self.model.apply(self.params, both)
        b = x_hat.shape[0]
        loss = jnp.float32(0.0)
        for name, w in zip(self.extract, self.layer_weights):
            f = feats[name].astype(jnp.float32)
            # Normalize per layer by feature magnitude scale so layer
            # weights are comparable across depths.
            diff = jnp.mean(jnp.abs(f[:b] - f[b:]))
            loss = loss + w * diff
        if self.pixel_weight:
            loss = loss + self.pixel_weight * jnp.mean(
                jnp.abs(x_hat.astype(jnp.float32) - x.astype(jnp.float32))
            )
        return loss
