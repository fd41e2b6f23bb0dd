"""Bilinear image resampling (the TPU-native grid_sample equivalent).

The reference relies on torch ``grid_sample``'s CUDA kernel for TPS
image warping (SURVEY.md §2.2). Here the backward warp is expressed as
a flat gather of the four neighbor pixels + VPU lerp; XLA lowers the
gather natively on TPU, and a fused Pallas variant lives in
partseg_tpu/partops/pallas/. Gradients flow through both the image
(scatter-add adjoint of gather, handled by JAX autodiff) and the
sampling coordinates (via the lerp weights).

Coordinates follow coords.py: (y, x) pixel-center normalized to [-1,1],
align_corners=False. Out-of-range samples clamp to the border
(padding_mode="border") or fade to zero ("zeros").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(
    image: jax.Array,
    coords: jax.Array,
    padding_mode: str = "border",
    impl: str = "auto",
) -> jax.Array:
    """Sample `image` at normalized coordinates.

    Args:
      image:  [B, H, W, C].
      coords: [B, N, 2] sampling locations (y, x) in [-1, 1]
              (values outside are handled per `padding_mode`).
      padding_mode: "border" or "zeros".
      impl: "auto" (fused Pallas kernel on TPU, gather elsewhere),
            "fused", or "gather" (the XLA-gather reference path).

    Returns:
      [B, N, C] sampled values, dtype of `image`.
    """
    if impl == "auto":
        impl = "fused" if jax.default_backend() == "tpu" else "gather"
    if impl == "fused":
        from partseg_tpu.partops.pallas import bilinear_sample_fused

        out = bilinear_sample_fused(image, coords)
        if padding_mode == "zeros":
            out = out * _zeros_fade(image.shape, coords).astype(out.dtype)
        elif padding_mode != "border":
            raise ValueError(f"unknown padding_mode: {padding_mode!r}")
        return out

    b, h, w, c = image.shape
    n = coords.shape[1]
    cf = coords.astype(jnp.float32)
    # Normalized [-1,1] (pixel centers) -> continuous pixel index space.
    fy = (cf[..., 0] + 1.0) * (0.5 * h) - 0.5                   # [B, N]
    fx = (cf[..., 1] + 1.0) * (0.5 * w) - 0.5

    y0 = jnp.floor(fy)
    x0 = jnp.floor(fx)
    wy = fy - y0                                                # lerp weights
    wx = fx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    y0c = jnp.clip(y0i, 0, h - 1)
    y1c = jnp.clip(y0i + 1, 0, h - 1)
    x0c = jnp.clip(x0i, 0, w - 1)
    x1c = jnp.clip(x0i + 1, 0, w - 1)

    flat = image.reshape(b, h * w, c)

    def take(yi, xi):
        idx = yi * w + xi                                       # [B, N]
        return jnp.take_along_axis(flat, idx[..., None], axis=1)  # [B, N, C]

    v00 = take(y0c, x0c)
    v01 = take(y0c, x1c)
    v10 = take(y1c, x0c)
    v11 = take(y1c, x1c)

    wyf = wy[..., None].astype(flat.dtype)
    wxf = wx[..., None].astype(flat.dtype)
    top = v00 + (v01 - v00) * wxf
    bot = v10 + (v11 - v10) * wxf
    out = top + (bot - top) * wyf                               # [B, N, C]

    if padding_mode == "zeros":
        out = out * _zeros_fade(image.shape, coords).astype(out.dtype)
    elif padding_mode != "border":
        raise ValueError(f"unknown padding_mode: {padding_mode!r}")
    return out


def _zeros_fade(image_shape, coords: jax.Array) -> jax.Array:
    """[B, N, 1] multiplier implementing padding_mode="zeros": linear
    fade to 0 at the image border (pure function of the coords, shared
    by the gather and fused implementations)."""
    _, h, w, _ = image_shape
    cf = coords.astype(jnp.float32)
    fy = (cf[..., 0] + 1.0) * (0.5 * h) - 0.5
    fx = (cf[..., 1] + 1.0) * (0.5 * w) - 0.5
    inside = (fy >= -1.0) & (fy <= h + 0.0) & (fx >= -1.0) & (fx <= w + 0.0)
    iy = jnp.clip(jnp.minimum(fy + 1.0, h - fy), 0.0, 1.0)
    ix = jnp.clip(jnp.minimum(fx + 1.0, w - fx), 0.0, 1.0)
    return (inside.astype(jnp.float32) * iy * ix)[..., None]


def warp_image(
    image: jax.Array,
    flow_coords: jax.Array,
    padding_mode: str = "border",
    impl: str = "auto",
) -> jax.Array:
    """Backward-warp an image with a dense coordinate field.

    Args:
      image:       [B, H, W, C].
      flow_coords: [B, Ho, Wo, 2] source sampling coords (y, x) ∈ [-1,1]
                   for every output pixel (the TPS backward flow).

    Returns:
      [B, Ho, Wo, C] warped image.
    """
    b, ho, wo, _ = flow_coords.shape
    out = bilinear_sample(
        image, flow_coords.reshape(b, ho * wo, 2), padding_mode, impl
    )
    return out.reshape(b, ho, wo, image.shape[-1])
