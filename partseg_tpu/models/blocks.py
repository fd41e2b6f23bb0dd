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


@jax.custom_vjp
def f8_store(x: jax.Array) -> jax.Array:
    """Storage-only float8 quantization at a fusion boundary.

    The value that crosses the XLA fusion boundary (and that the
    backward pass re-reads) becomes float8_e4m3; both the down- and
    up-cast fuse into the producer/consumer fusions, so the materialized
    HBM buffer halves vs bf16 while all COMPUTE stays in the surrounding
    ops' dtype. The gradient is straight-through (identity): without the
    custom VJP, JAX's convert_element_type transpose would round the
    cotangent through f8 as well, quantizing gradients — a separate
    experiment we do not want bundled in.
    """
    return x.astype(jnp.float8_e4m3fn).astype(x.dtype)


def _f8_store_fwd(x):
    return f8_store(x), None


def _f8_store_bwd(_, g):
    return (g,)


f8_store.defvjp(_f8_store_fwd, _f8_store_bwd)


def quantize_activation(x: jax.Array, act_quant: str) -> jax.Array:
    """Apply the configured activation-storage quantization (perf knob:
    the train step is HBM-bandwidth-bound, docs/perf_ledger.md)."""
    if act_quant == "none":
        return x
    if act_quant == "f8":
        return f8_store(x)
    raise ValueError(f"unknown act_quant mode: {act_quant!r}")


class ResBlock(nn.Module):
    """Pre-activation residual block (the hourglass workhorse).

    Bottleneck layout as in stacked-hourglass nets: 1×1 (C/2) → 3×3 (C/2)
    → 1×1 (C), with a 1×1 projection skip when channel counts change.

    norm modes: "group" = GN before every conv (3/block);
    "block" = ONE GN at block entry (default — GN is ~45% of the trunk's
    backward time on TPU and once per block normalizes just as well);
    "none" = no normalization.

    act_quant: "none" | "f8" — quantize the block OUTPUT for storage
    (see f8_store). The block-entry GN re-normalizes whatever rounding
    the previous block's exit introduced, which is why the boundary
    sits here.
    """

    features: int
    norm: str = "block"
    act_quant: str = "none"
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
        return quantize_activation(x + y, self.act_quant)


def upsample2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2× upsampling (cheap, XLA-fusible broadcast)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)
