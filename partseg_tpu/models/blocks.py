"""Conv building blocks (Flax linen, NHWC, bf16-friendly)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBlock(nn.Module):
    """norm → activation → conv (pre-activation ordering).

    norm: "group" (default) or "none" — normalization is a measurable
    share of the memory-bound cost on TPU, so it is a knob.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 8
    norm: str = "group"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.norm == "group":
            g = min(self.groups, x.shape[-1])
            # bf16 compute dtype: statistics are still accumulated in f32
            # internally by flax; halves the normalization's HBM traffic.
            x = nn.GroupNorm(num_groups=g, dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class ResBlock(nn.Module):
    """Pre-activation residual block (the hourglass workhorse).

    Bottleneck layout as in stacked-hourglass nets: 1×1 (C/2) → 3×3 (C/2)
    → 1×1 (C), with a 1×1 projection skip when channel counts change.

    norm modes: "group" = GN before every conv (3/block);
    "block" = ONE GN at block entry (default — GN is ~45% of the trunk's
    backward time on TPU and once per block normalizes just as well);
    "none" = no normalization.
    """

    features: int
    norm: str = "block"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        half = max(self.features // 2, 8)
        inner = "group" if self.norm == "group" else "none"
        if self.norm == "block":
            g = min(8, x.shape[-1])
            x = nn.GroupNorm(num_groups=g, dtype=self.dtype)(x)
        y = ConvBlock(half, kernel=1, norm=inner, dtype=self.dtype)(x)
        y = ConvBlock(half, kernel=3, norm=inner, dtype=self.dtype)(y)
        y = ConvBlock(self.features, kernel=1, norm=inner, dtype=self.dtype)(y)
        if x.shape[-1] != self.features:
            x = nn.Conv(
                self.features, (1, 1), dtype=self.dtype, param_dtype=jnp.float32
            )(x)
        return x + y


def upsample2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2× upsampling (cheap, XLA-fusible broadcast)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)
