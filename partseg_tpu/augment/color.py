"""On-device color jitter (brightness / contrast / saturation / hue).

Role parity: the reference's `appearance_augmentation` (SURVEY.md §2.1
"Color-jitter sampler", [B:5], [PAPER]) — but sampled with jax.random
inside the jit region and applied on-device, batched.

Hue rotation uses the YIQ-space rotation formulation (a fixed 3×3
linear map per hue angle), which is cheap, differentiable, and avoids
HSV branching that XLA dislikes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

# RGB <-> YIQ (NTSC) matrices.
_RGB2YIQ = jnp.asarray(
    [[0.299, 0.587, 0.114], [0.5959, -0.2746, -0.3213], [0.2115, -0.5227, 0.3112]],
    jnp.float32,
)
# Exact inverse (so hue=0 is exactly the identity map).
import numpy as _np

_YIQ2RGB = jnp.asarray(_np.linalg.inv(_np.asarray(_RGB2YIQ)), jnp.float32)
_LUMA = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ColorParams:
    brightness: jax.Array  # [...]: additive shift
    contrast: jax.Array    # [...]: multiplicative around mean
    saturation: jax.Array  # [...]: lerp factor vs grayscale
    hue: jax.Array         # [...]: rotation angle (radians)


def sample_color_params(
    key: jax.Array,
    batch: tuple[int, ...] | int,
    brightness: float = 0.1,
    contrast: float = 0.3,
    saturation: float = 0.3,
    hue: float = 0.3,
) -> ColorParams:
    """Sample per-sample jitter parameters (uniform in the given ranges)."""
    shape = (batch,) if isinstance(batch, int) else tuple(batch)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return ColorParams(
        brightness=jax.random.uniform(k1, shape, minval=-brightness, maxval=brightness),
        contrast=jax.random.uniform(k2, shape, minval=1.0 - contrast, maxval=1.0 + contrast),
        saturation=jax.random.uniform(k3, shape, minval=1.0 - saturation, maxval=1.0 + saturation),
        hue=jax.random.uniform(k4, shape, minval=-hue, maxval=hue),
    )


def color_jitter(image: jax.Array, params: ColorParams) -> jax.Array:
    """Apply jitter. image: [B, H, W, 3] in [0, 1]; params leading dims [B]."""
    x = image.astype(jnp.float32)
    b = params.brightness[..., None, None, None]
    c = params.contrast[..., None, None, None]
    s = params.saturation[..., None, None, None]

    # Hue: rotate the IQ chroma plane by the sampled angle.
    cos = jnp.cos(params.hue)
    sin = jnp.sin(params.hue)
    zeros = jnp.zeros_like(cos)
    ones = jnp.ones_like(cos)
    rot = jnp.stack(
        [
            jnp.stack([ones, zeros, zeros], -1),
            jnp.stack([zeros, cos, -sin], -1),
            jnp.stack([zeros, sin, cos], -1),
        ],
        -2,
    )                                                           # [..., 3, 3]
    hue_mat = jnp.einsum("ij,...jk,kl->...il", _YIQ2RGB, rot, _RGB2YIQ)
    x = jnp.einsum("...hwc,...dc->...hwd", x, hue_mat)

    # Saturation: lerp toward per-pixel luma.
    gray = jnp.einsum("...hwc,c->...hw", x, _LUMA)[..., None]
    x = gray + (x - gray) * s
    # Contrast: scale around the per-image mean luma.
    mean = jnp.mean(gray, axis=(-3, -2, -1), keepdims=True)
    x = mean + (x - mean) * c
    # Brightness.
    x = x + b
    return jnp.clip(x, 0.0, 1.0).astype(image.dtype)
