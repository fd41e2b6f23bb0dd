"""Fused per-part spatial softmax + soft-argmax moments kernel.

One VMEM pass over the [HW, K] logits per batch element produces both
the normalized part distributions AND the raw moments ([5, K] against
the (y, x, y², yx, x²) monomial basis): the logits are read from HBM
once, instead of softmax (2 passes) + separate moment matmul (1 more
read) in the unfused path (SURVEY.md §2.2 "softmax/reduction kernels →
fused Pallas kernel: part-softmax + spatial normalization + μ/Σ
moments in one VMEM pass").

Forward: Pallas, grid (B,). Backward: standard softmax/matmul vjp
formulas in jnp (matmul-dominated, XLA-fused).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from partseg_tpu.partops.coords import moment_basis


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(logits_ref, basis_ref, parts_ref, raw_ref):
    x = logits_ref[0]                                     # [HW, Kp] f32
    m = jnp.max(x, axis=0, keepdims=True)
    e = jnp.exp(x - m)
    s = jnp.sum(e, axis=0, keepdims=True)
    p = e / s
    parts_ref[0] = p
    # [8, HW] @ [HW, Kp] — tiny-M matmul. HIGHEST precision is MANDATORY:
    # at default (bf16 MXU) precision the covariance E[u²] − E[u]² cancels
    # catastrophically once parts sharpen, Σ goes indefinite, and the
    # downstream exp(−½ uᵀΛu) blows up (observed: training NaN at ~step
    # 170 on synthetic; SURVEY.md §7.4 risk 5).
    raw_ref[0] = jax.lax.dot_general(
        basis_ref[:], p,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def softmax_moments(logits: jax.Array, interpret: bool | None = None):
    """logits [B, H, W, K] → (parts [B, H, W, K] f32, mu [B, K, 2] f32,
    sigma [B, K, 2, 2] f32). Numerics identical to
    spatial_softmax + soft_argmax_moments."""
    return _forward(logits, interpret)


def _forward(logits, interpret):
    if interpret is None:
        from partseg_tpu.partops.pallas import use_interpret

        interpret = use_interpret()
    b, h, w, k = logits.shape
    hw = h * w
    kp = _round_up(k, 128)
    x = jnp.zeros((b, hw, kp), jnp.float32).at[:, :, :k].set(
        logits.astype(jnp.float32).reshape(b, hw, k)
    )
    # Basis rows padded 5 -> 8 sublanes.
    basis = jnp.zeros((8, hw), jnp.float32).at[:5].set(moment_basis(h, w).T)

    parts, raw = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, hw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, hw, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, hw, kp), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, kp), jnp.float32),
        ),
        interpret=interpret,
    )(x, basis)

    parts = parts[:, :, :k].reshape(b, h, w, k)
    raw = raw[:, :5, :k]                                   # [B, 5, K]
    ey, ex, eyy, eyx, exx = (raw[:, i] for i in range(5))
    mu = jnp.stack([ey, ex], axis=-1)
    cyy = eyy - ey * ey
    cyx = eyx - ey * ex
    cxx = exx - ex * ex
    sigma = jnp.stack(
        [jnp.stack([cyy, cyx], -1), jnp.stack([cyx, cxx], -1)], axis=-2
    )
    return parts, mu, sigma


def _fwd(logits, interpret):
    parts, mu, sigma = _forward(logits, interpret)
    return (parts, mu, sigma), (parts, mu)


def _bwd(interpret, res, cotangents):
    parts, mu = res
    g_parts, g_mu, g_sigma = cotangents
    b, h, w, k = parts.shape
    basis = moment_basis(h, w)                             # [HW, 5]
    pf = parts.reshape(b, h * w, k)

    # Chain (mu, sigma) cotangents back to raw-moment cotangents.
    ey, ex = mu[..., 0], mu[..., 1]
    g_ey = g_mu[..., 0]
    g_ex = g_mu[..., 1]
    g_cyy = g_sigma[..., 0, 0]
    g_cyx = g_sigma[..., 0, 1] + g_sigma[..., 1, 0]
    g_cxx = g_sigma[..., 1, 1]
    # c = E2 − E1·E1ᵀ terms:
    g_ey = g_ey - 2.0 * g_cyy * ey - g_cyx * ex
    g_ex = g_ex - 2.0 * g_cxx * ex - g_cyx * ey
    g_raw = jnp.stack([g_ey, g_ex, g_cyy, g_cyx, g_cxx], axis=1)   # [B, 5, K]

    # parts cotangent from moments + direct parts cotangent.
    g_p = jnp.einsum("nm,bmk->bnk", basis, g_raw)
    if g_parts is not None:
        g_p = g_p + g_parts.reshape(b, h * w, k).astype(jnp.float32)

    # Softmax (over axis HW) vjp: dL/dx = p * (g − Σ_n p·g).
    inner = jnp.sum(pf * g_p, axis=1, keepdims=True)
    g_logits = pf * (g_p - inner)
    return (g_logits.reshape(b, h, w, k),)


softmax_moments.defvjp(_fwd, _bwd)
