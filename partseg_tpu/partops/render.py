"""Gaussian part rendering: (μ, Σ) → blob maps on an H×W grid.

Method (SURVEY.md §2.1 "Gaussian part rendering", [B:5], [PAPER]):

    d_k(u)  = (u − μ_k)ᵀ Σ_k⁻¹ (u − μ_k)          (Mahalanobis distance)
    φ_k(u)  = exp(−½ d_k(u))                       kernel="gauss"
    φ_k(u)  = 1 / (1 + d_k(u))                     kernel="heavy_tail"

Rendered at each decoder feature resolution. The quadratic form is
expanded so the hot path is pure broadcasted FMA on the VPU:
    d = Λ00·dy² + 2Λ01·dy·dx + Λ11·dx².
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from partseg_tpu.partops.coords import coord_grid
from partseg_tpu.partops.moments import precision_from_cov


def render_gaussians(
    mu: jax.Array,
    sigma: jax.Array,
    h: int,
    w: int,
    kernel: str = "gauss",
    eps: float = 1e-4,
    precision: jax.Array | None = None,
    dtype=jnp.float32,
) -> jax.Array:
    """Render K part blobs.

    Args:
      mu:    [B, K, 2] part means, (y, x) in [-1, 1].
      sigma: [B, K, 2, 2] part covariances (ignored if `precision` given).
      h, w:  output resolution.
      kernel: "gauss" (exp(−½d)) or "heavy_tail" (1/(1+d)).
      precision: optional precomputed Λ = Σ⁻¹, [B, K, 2, 2].

    Returns:
      [B, H, W, K] blob maps in [0, 1], dtype `dtype`.
    """
    lam = precision_from_cov(sigma, eps) if precision is None else precision
    yy, xx = coord_grid(h, w)                                  # [H, W]
    muf = mu.astype(jnp.float32)
    dy = yy[None, :, :, None] - muf[:, None, None, :, 0]        # [B, H, W, K]
    dx = xx[None, :, :, None] - muf[:, None, None, :, 1]
    l00 = lam[:, None, None, :, 0, 0]
    l01 = lam[:, None, None, :, 0, 1]
    l11 = lam[:, None, None, :, 1, 1]
    # d ≥ 0 for SPD Λ; the clamp is insurance against numerically
    # indefinite precision matrices (exp(−½·negative) would explode).
    d = jnp.maximum(
        l00 * dy * dy + 2.0 * l01 * dy * dx + l11 * dx * dx, 0.0
    )
    if kernel == "gauss":
        phi = jnp.exp(-0.5 * d)
    elif kernel == "heavy_tail":
        phi = 1.0 / (1.0 + d)
    else:
        raise ValueError(f"unknown render kernel: {kernel!r}")
    return phi.astype(dtype)
