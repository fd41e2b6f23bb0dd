"""Fused Gaussian render + decoder-input assembly kernel.

Computes, for every output pixel u and channel c:

    out[u, c] = Σ_k φ_k(u) · a[k, c],   φ_k(u) = exp(−½ (u−μ_k)ᵀ Λ_k (u−μ_k))
                                     or 1/(1+d)  ("heavy_tail")

in one pass: a tile of φ lives only in VMEM/registers and goes straight
into an MXU matmul with the appearance matrix — the [B, H, W, K] blob
tensor of the unfused path (partops.render + partops.assembly) never
touches HBM. This is the memory-bound stage SURVEY.md §2.2 targets
("Gaussian render + appearance outer-product-sum ... without
materializing K×H×W×C").

Forward: Pallas, grid (B, HW/T). Backward: closed-form einsum formulas
(XLA) with φ recomputed — still no HBM blob tensor in the forward pass,
and the backward is matmul-dominated.

Parts axis is padded to the 128-lane boundary with a[k]=0, so padded
parts contribute nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(grid_ref, par_ref, app_ref, out_ref, *, kernel_kind):
    # Pixel-center coords for this tile come in as a precomputed table,
    # and the per-part scalars (mu_y, mu_x, l00, l01, l11) as ROWS of a
    # [8, Kp] block — natural sublane/lane layouts throughout. Earlier
    # variants (in-kernel iota + div/mod; lane-dim-2 mu/lam blocks)
    # forced Mosaic into ~48 MB of scoped-vmem relayout temporaries.
    yc = grid_ref[:, 0:1]                                # [T, 1]
    xc = grid_ref[:, 1:2]

    mu_y = par_ref[0, 0:1, :]                            # [1, Kp]
    mu_x = par_ref[0, 1:2, :]
    l00 = par_ref[0, 2:3, :]
    l01 = par_ref[0, 3:4, :]
    l11 = par_ref[0, 4:5, :]

    dy = yc - mu_y                                       # [T, Kp]
    dx = xc - mu_x
    # Clamp: numerically indefinite Λ must not turn exp(−½d) into exp(+).
    d = jnp.maximum(
        l00 * dy * dy + 2.0 * l01 * dy * dx + l11 * dx * dx, 0.0
    )
    if kernel_kind == "gauss":
        phi = jnp.exp(-0.5 * d)
    else:
        phi = 1.0 / (1.0 + d)
    out_ref[0] = jnp.dot(
        phi, app_ref[0], preferred_element_type=jnp.float32
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def render_assemble(
    mu: jax.Array,
    lam: jax.Array,
    app: jax.Array,
    h: int,
    w: int,
    kernel: str = "gauss",
    interpret: bool | None = None,
) -> jax.Array:
    """Fused render+assemble.

    Args:
      mu:  [B, K, 2] part means (y, x) in [-1, 1], f32.
      lam: [B, K, 2, 2] precision matrices (Σ⁻¹), f32.
      app: [B, K, C] appearance vectors.
      h, w: output resolution.
      kernel: "gauss" | "heavy_tail".

    Returns [B, h, w, C] f32.
    """
    return _forward(mu, lam, app, h, w, kernel, interpret)


def _forward(mu, lam, app, h, w, kernel, interpret):
    if interpret is None:
        from partseg_tpu.partops.pallas import use_interpret

        interpret = use_interpret()
    b, k, c = app.shape
    kp = _round_up(k, 128)
    cp = _round_up(c, 128)
    hw = h * w
    tile = min(512, hw)
    assert hw % tile == 0, (h, w, tile)

    # Rows: mu_y, mu_x, l00, l01, l11 (padded parts get lam=I so d grows
    # away from the origin; their app rows are 0, killing them).
    par = jnp.zeros((b, 8, kp), jnp.float32)
    par = par.at[:, 2, :].set(1.0).at[:, 4, :].set(1.0)
    par = par.at[:, 0, :k].set(mu[..., 0].astype(jnp.float32))
    par = par.at[:, 1, :k].set(mu[..., 1].astype(jnp.float32))
    par = par.at[:, 2, :k].set(lam[..., 0, 0].astype(jnp.float32))
    par = par.at[:, 3, :k].set(lam[..., 0, 1].astype(jnp.float32))
    par = par.at[:, 4, :k].set(lam[..., 1, 1].astype(jnp.float32))
    appf = jnp.zeros((b, kp, cp), jnp.float32).at[:, :k, :c].set(
        app.astype(jnp.float32)
    )

    from partseg_tpu.partops.coords import coord_grid

    yy, xx = coord_grid(h, w)
    grid_tab = jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)  # [HW, 2]

    out = pl.pallas_call(
        functools.partial(_kernel, kernel_kind=kernel),
        grid=(b, hw // tile),
        in_specs=[
            pl.BlockSpec((tile, 2), lambda i, t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, kp), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp, cp), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, cp), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, hw, cp), jnp.float32),
        interpret=interpret,
    )(grid_tab, par, appf)
    return out[:, :, :c].reshape(b, h, w, c)


def _phi_and_diffs(mu, lam, h, w, kernel):
    """jnp recompute of φ (and residuals) for the backward pass."""
    from partseg_tpu.partops.coords import coord_grid

    yy, xx = coord_grid(h, w)
    u = jnp.stack([yy.reshape(-1), xx.reshape(-1)], -1)   # [HW, 2]
    diff = u[None, :, None, :] - mu[:, None, :, :].astype(jnp.float32)  # [B,HW,K,2]
    lamf = lam.astype(jnp.float32)
    d = jnp.maximum(jnp.einsum("bnki,bkij,bnkj->bnk", diff, lamf, diff), 0.0)
    if kernel == "gauss":
        phi = jnp.exp(-0.5 * d)
        dphi_dd = -0.5 * phi
    else:
        phi = 1.0 / (1.0 + d)
        dphi_dd = -(phi * phi)
    return u, diff, phi, dphi_dd


def _fwd(mu, lam, app, h, w, kernel, interpret):
    out = _forward(mu, lam, app, h, w, kernel, interpret)
    return out, (mu, lam, app)


def _bwd(h, w, kernel, interpret, res, g):
    mu, lam, app = res
    b, k, c = app.shape
    gf = g.reshape(b, h * w, c).astype(jnp.float32)
    _, diff, phi, dphi_dd = _phi_and_diffs(mu, lam, h, w, kernel)
    appf = app.astype(jnp.float32)

    d_app = jnp.einsum("bnk,bnc->bkc", phi, gf)
    g_phi = jnp.einsum("bnc,bkc->bnk", gf, appf)          # [B, HW, K]
    g_d = g_phi * dphi_dd
    # d = diffᵀ Λ diff:  ∂d/∂μ = −2 Λ diff;  ∂d/∂Λ = diff diffᵀ. The
    # forward reads only Λ[...,0,1] for the (doubled) off-diagonal term,
    # so the whole off-diagonal cotangent lands there ([...,1,0] gets 0)
    # — matching the unfused render_gaussians path exactly.
    d_mu = jnp.einsum("bnk,bkij,bnkj->bki", g_d, -2.0 * lam.astype(jnp.float32), diff)
    d_sym = jnp.einsum("bnk,bnki,bnkj->bkij", g_d, diff, diff)
    d_lam = (
        jnp.zeros_like(d_sym)
        .at[..., 0, 0].set(d_sym[..., 0, 0])
        .at[..., 1, 1].set(d_sym[..., 1, 1])
        .at[..., 0, 1].set(d_sym[..., 0, 1] + d_sym[..., 1, 0])
    )
    return (
        d_mu.astype(mu.dtype),
        d_lam.astype(lam.dtype),
        d_app.astype(app.dtype),
    )


render_assemble.defvjp(_fwd, _bwd)
