"""Spatial sharding: H-sharded feature maps over a "space" mesh axis.

Implements docs/spatial_sharding.md — the sequence-parallelism analog
for this CNN workload (SURVEY.md §5.7): once images outgrow one chip
(>128px configs), activations shard as P("data", "space", None, None)
— batch over "data", image ROWS over "space" — with params replicated.

Building blocks (each used under shard_map, tested exactly vs the
unsharded ops on the 8-virtual-device CPU mesh in
tests/test_spatial_sharding.py):

  halo_exchange             neighbor rows over ICI (ppermute) for convs
  sharded_spatial_conv      SAME conv on row shards == global SAME conv
  sharded_spatial_softmax   per-part softmax over the GLOBAL H×W
  sharded_soft_argmax_moments  raw-moment partials + psum
  sharded_render_gaussians  row-local rendering (no comms)
  sharded_pool_appearance   num/den partial sums + psum

Every op is exact (not approximate) under sharding: softmax uses a
global pmax/psum two-pass, moments psum the [B,K,5] raw-moment
partials, and convs see true neighbor rows (zeros at the global edges,
matching XLA SAME padding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from partseg_tpu.partops.coords import coord_grid, moment_basis
from partseg_tpu.partops.moments import moments_from_raw, precision_from_cov

SPACE_AXIS = "space"


def _axis_size(axis_name: str) -> int:
    """Static size of a shard_map mesh axis."""
    return jax.lax.axis_size(axis_name)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _pmax_stopgrad(x: jax.Array, axis_name: str) -> jax.Array:
    """pmax with defined (zero) gradient: used for softmax stabilizers,
    which are shift-invariant constants — jax has no pmax diff rule, and
    stop_gradient alone does not spare the primitive from JVP tracing."""
    return jax.lax.pmax(x, axis_name)


def _pmax_fwd(x, axis_name):
    return jax.lax.pmax(x, axis_name), None


def _pmax_bwd(axis_name, _res, g):
    return (jnp.zeros_like(g),)


_pmax_stopgrad.defvjp(_pmax_fwd, _pmax_bwd)


def _row_offset(h_local: int, axis_name: str):
    """First GLOBAL row index held by this shard (traced int32)."""
    return jax.lax.axis_index(axis_name) * h_local


def halo_exchange(x: jax.Array, halo: int, axis_name: str = SPACE_AXIS):
    """Extend a row shard with `halo` rows from each spatial neighbor.

    x: [B, H_local, W, C] → [B, H_local + 2·halo, W, C]. Shard i
    receives the bottom rows of shard i−1 above and the top rows of
    shard i+1 below — one ppermute hop each way, riding the ICI ring
    concurrently. Global-edge shards get ZERO rows, matching XLA's
    SAME-padding semantics, so a VALID-in-H conv over the widened slab
    equals the global SAME conv exactly.
    """
    n = _axis_size(axis_name)
    if halo <= 0 or n == 1:
        pad = [(0, 0), (halo, halo), (0, 0), (0, 0)]
        return jnp.pad(x, pad) if halo > 0 else x
    above = jax.lax.ppermute(
        x[:, -halo:], axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    below = jax.lax.ppermute(
        x[:, :halo], axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    return jnp.concatenate([above, x, below], axis=1)


def sharded_spatial_conv(
    x: jax.Array, kernel: jax.Array, axis_name: str = SPACE_AXIS
) -> jax.Array:
    """SAME-padded conv over the GLOBAL image from a row shard.

    x: [B, H_local, W, Cin]; kernel: [kh, kw, Cin, Cout] (HWIO). Halos
    cover the H context; W stays SAME-padded locally (unsharded axis).
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    x = halo_exchange(x, kh // 2, axis_name)
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(1, 1),
        padding=((0, 0), (kw // 2, kw // 2)),      # VALID in H, SAME in W
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def sharded_spatial_softmax(
    logits: jax.Array, axis_name: str = SPACE_AXIS
) -> jax.Array:
    """Per-part softmax over the GLOBAL H×W from row shards.

    logits: [B, H_local, W, K] → distribution whose sum over the GLOBAL
    (H, W) is 1 per (batch, part). Two-pass: global max via pmax (for
    stability), then exp-sum via psum — the shard_map form of
    partops.softmax.spatial_softmax.
    """
    x = logits.astype(jnp.float32)
    m = jnp.max(x, axis=(1, 2), keepdims=True)
    # Custom-vjp pmax with zero gradient: softmax is shift-invariant,
    # so the stabilizer carries no gradient (jax has no pmax diff rule).
    m = _pmax_stopgrad(jax.lax.stop_gradient(m), axis_name)
    e = jnp.exp(x - m)
    s = jax.lax.psum(jnp.sum(e, axis=(1, 2), keepdims=True), axis_name)
    return e / s


def _local_grid(h_global: int, w: int, h_local: int, axis_name: str):
    """(yy, xx) [H_local, W] at this shard's GLOBAL row coordinates."""
    yy, xx = coord_grid(h_global, w)                    # static [H, W]
    r0 = _row_offset(h_local, axis_name)
    yy = jax.lax.dynamic_slice(yy, (r0, 0), (h_local, w))
    xx = jax.lax.dynamic_slice(xx, (r0, 0), (h_local, w))
    return yy, xx


def sharded_soft_argmax_moments(
    p: jax.Array, h_global: int, axis_name: str = SPACE_AXIS
):
    """(μ, Σ) of a globally-normalized distribution from row shards.

    p: [B, H_local, W, K] rows of a global distribution (e.g. the
    output of sharded_spatial_softmax). Each shard contributes its
    [B, K, 5] raw-moment partial against the moment basis evaluated at
    its GLOBAL row coordinates; one psum then yields exact global
    moments (docs/spatial_sharding.md "part ops").
    """
    b, h_local, w, k = p.shape
    basis = moment_basis(h_global, w).reshape(h_global, w, 5)
    r0 = _row_offset(h_local, axis_name)
    basis = jax.lax.dynamic_slice(
        basis, (r0, 0, 0), (h_local, w, 5)
    ).reshape(h_local * w, 5)
    pf = p.astype(jnp.float32).reshape(b, h_local * w, k)
    raw = jnp.einsum(
        "bnk,nm->bkm", pf, basis,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    raw = jax.lax.psum(raw, axis_name)
    return moments_from_raw(raw)


def sharded_render_gaussians(
    mu: jax.Array,
    sigma: jax.Array,
    h_global: int,
    w: int,
    h_local: int,
    kernel: str = "gauss",
    eps: float = 1e-4,
    precision: jax.Array | None = None,
    axis_name: str = SPACE_AXIS,
    dtype=jnp.float32,
) -> jax.Array:
    """Render each shard's rows of the global blob maps — row-parallel,
    zero communication: (μ, Σ) are replicated, the grid rows are local
    (docs/spatial_sharding.md "rendering / assembly")."""
    lam = precision_from_cov(sigma, eps) if precision is None else precision
    yy, xx = _local_grid(h_global, w, h_local, axis_name)
    muf = mu.astype(jnp.float32)
    dy = yy[None, :, :, None] - muf[:, None, None, :, 0]
    dx = xx[None, :, :, None] - muf[:, None, None, :, 1]
    l00 = lam[:, None, None, :, 0, 0]
    l01 = lam[:, None, None, :, 0, 1]
    l11 = lam[:, None, None, :, 1, 1]
    d = jnp.maximum(l00 * dy * dy + 2.0 * l01 * dy * dx + l11 * dx * dx, 0.0)
    if kernel == "gauss":
        phi = jnp.exp(-0.5 * d)
    elif kernel == "heavy_tail":
        phi = 1.0 / (1.0 + d)
    else:
        raise ValueError(f"unknown render kernel: {kernel!r}")
    return phi.astype(dtype)


def sharded_pool_appearance(
    feats: jax.Array,
    parts: jax.Array,
    eps: float = 1e-8,
    axis_name: str = SPACE_AXIS,
) -> jax.Array:
    """Part-mask-weighted feature average over the GLOBAL image from
    row shards: numerator/denominator partial sums + one psum
    (docs/spatial_sharding.md "pooling")."""
    b, h, w, c = feats.shape
    k = parts.shape[-1]
    f = feats.astype(jnp.float32).reshape(b, h * w, c)
    p = parts.astype(jnp.float32).reshape(b, h * w, k)
    num = jnp.einsum("bnk,bnc->bkc", p, f, preferred_element_type=jnp.float32)
    den = jnp.sum(p, axis=1)[..., None]
    num = jax.lax.psum(num, axis_name)
    den = jax.lax.psum(den, axis_name)
    return num / (den + eps)
