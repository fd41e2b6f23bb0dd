"""TPS equivariance loss on part moments.

Method (SURVEY.md §2.1 "Equivariance loss" [B:5,8][PAPER]):

    L_eq = Σ_k ‖T(μ_k(x_s)) − μ_k(x_a)‖²
         + λ_Σ Σ_k ‖J(μ_s) Σ_k(x_s) J(μ_s)ᵀ − Σ_k(x_a)‖_F

Geometry: x_s(u) = x(T(u)) (backward warp), so a part detected at μ_s
in the warped view sits at T(μ_s) in the original frame; locally,
covariance transports as J Σ Jᵀ with J the TPS Jacobian at μ_s. The
shape stream on x_a shares the geometry of x (color jitter moves no
pixels), hence the comparison against (μ_a, Σ_a). Forces shape codes to
be equivariant to warps and invariant to appearance changes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from partseg_tpu.augment.tps import TPSParams, TPSSampler


def equivariance_loss(
    sampler: TPSSampler,
    tps: TPSParams,
    mu_s: jax.Array,
    sigma_s: jax.Array,
    mu_a: jax.Array,
    sigma_a: jax.Array,
    sigma_weight: float = 1.0,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Returns (scalar loss, metrics dict). All moment math in f32."""
    mu_pred = sampler.transform_points(tps, mu_s.astype(jnp.float32))
    jac = sampler.jacobian(tps, mu_s)                          # [B, K, 2, 2]
    sig_pred = jnp.einsum(
        "bkij,bkjl,bkml->bkim", jac, sigma_s.astype(jnp.float32), jac
    )
    mu_err = jnp.sum((mu_pred - mu_a.astype(jnp.float32)) ** 2, axis=-1)
    sig_err = jnp.sqrt(
        jnp.sum((sig_pred - sigma_a.astype(jnp.float32)) ** 2, axis=(-2, -1)) + 1e-12
    )
    loss_mu = jnp.mean(mu_err)
    loss_sig = jnp.mean(sig_err)
    loss = loss_mu + sigma_weight * loss_sig
    return loss, {"equiv_mu": loss_mu, "equiv_sigma": loss_sig}
