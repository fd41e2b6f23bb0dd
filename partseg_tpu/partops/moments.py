"""Soft-argmax μ/Σ extraction from normalized part maps.

Method (SURVEY.md §2.1 "Soft-argmax μ/Σ extraction", [B:5], [PAPER]):

    μ_k = Σ_u u · p_k(u)                       (2-vector, u=(y,x) ∈ [-1,1]²)
    Σ_k = Σ_u p_k(u) (u − μ_k)(u − μ_k)ᵀ       (2×2 SPD)

Implemented as ONE batched matmul against the [H*W, 5] monomial basis
(coords.moment_basis), so the whole reduction rides the MXU instead of
five separate VPU reductions. Always computed in f32 — covariance
inversion at bf16 is numerically unsafe (SURVEY.md §7.4 risk 5).
"""

from __future__ import annotations

import chex
import jax
import jax.numpy as jnp

from partseg_tpu.partops.coords import moment_basis


def soft_argmax_moments(p: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Extract (μ, Σ) from normalized part maps.

    Args:
      p: [B, H, W, K] — per-part spatial distributions (each part's map
         sums to 1 over H×W; see softmax.spatial_softmax).

    Returns:
      mu:    [B, K, 2] f32, (y, x) in [-1, 1].
      sigma: [B, K, 2, 2] f32 SPD covariance.
    """
    chex.assert_rank(p, 4)
    b, h, w, k = p.shape
    basis = moment_basis(h, w)                                 # [HW, 5]
    pf = p.astype(jnp.float32).reshape(b, h * w, k)
    # [B, K, HW] @ [HW, 5] -> [B, K, 5] raw moments.
    # HIGHEST precision: this matmul is tiny ([HW,5]) but feeds the 2x2
    # covariance inversion — bf16 MXU passes are not safe here (§7.4 risk 5).
    raw = jnp.einsum(
        "bnk,nm->bkm", pf, basis,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    return moments_from_raw(raw)


def moments_from_raw(raw: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(μ, Σ) from raw moments [..., 5] = (E[y], E[x], E[y²], E[yx], E[x²]).

    Split out so spatially-sharded callers can psum raw-moment partials
    over the "space" mesh axis first (parallel/spatial.py)."""
    ey, ex, eyy, eyx, exx = (raw[..., i] for i in range(5))
    mu = jnp.stack([ey, ex], axis=-1)                          # [..., 2]
    cyy = eyy - ey * ey
    cyx = eyx - ey * ex
    cxx = exx - ex * ex
    sigma = jnp.stack(
        [jnp.stack([cyy, cyx], axis=-1), jnp.stack([cyx, cxx], axis=-1)],
        axis=-2,
    )                                                          # [..., 2, 2]
    return mu, sigma


def precision_from_cov(sigma: jax.Array, eps: float = 1e-4) -> jax.Array:
    """Closed-form 2×2 inverse of Σ + eps·I (SURVEY.md §2.1).

    sigma: [..., 2, 2] SPD → precision Λ = (Σ + eps I)⁻¹, same shape, f32.

    eps floors the blob std at 0.01 (≈ ⅓ of a 64²-map pixel in [-1,1]
    coords). Tighter floors let Λ and especially ∂Λ/∂Σ ∝ Λ² overflow
    f32 once the equivariance loss sharpens parts (observed: training
    NaN'd at step ~130 on synthetic with eps=1e-6).
    """
    s = sigma.astype(jnp.float32)
    a = s[..., 0, 0] + eps
    bq = s[..., 0, 1]
    d = s[..., 1, 1] + eps
    # det floor: guards against numerically indefinite inputs flipping
    # the precision's sign (which would turn the Gaussian into exp(+d)).
    det = jnp.maximum(a * d - bq * bq, eps * eps)
    inv_det = 1.0 / det
    row0 = jnp.stack([d * inv_det, -bq * inv_det], axis=-1)
    row1 = jnp.stack([-bq * inv_det, a * inv_det], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def chol2x2(sigma: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Closed-form Cholesky factor L (lower) of Σ + eps·I, [..., 2, 2] f32.

    Provided for the ε-regularized Cholesky parameterization variant
    (SURVEY.md §2.1 "precision via ... Cholesky L with ε-regularization").
    """
    s = sigma.astype(jnp.float32)
    a = s[..., 0, 0] + eps
    bq = s[..., 0, 1]
    d = s[..., 1, 1] + eps
    l00 = jnp.sqrt(a)
    l10 = bq / l00
    l11 = jnp.sqrt(jnp.maximum(d - l10 * l10, eps))
    zero = jnp.zeros_like(l00)
    row0 = jnp.stack([l00, zero], axis=-1)
    row1 = jnp.stack([l10, l11], axis=-1)
    return jnp.stack([row0, row1], axis=-2)
