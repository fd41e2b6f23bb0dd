"""Fused bilinear-resample kernel (the TPS image-warp hot path).

XLA lowers the gather formulation of bilinear sampling (partops.warp)
to a slow scalarized gather on TPU — profiled at 37 ms for a 64×128²×3
batch, the most expensive op in the train step. This kernel
reformulates the 4-tap gather as MXU work: the y-interpolation weights
are folded INTO the row-selection matrix,

    W_y[t, y] = (1−wy_t)·[y == y0_t] + wy_t·[y == y1_t]

so ONE [T, H] @ [H, W] matmul per channel produces the y-interpolated
rows, and the x-taps reduce on the VPU with the analogous per-pixel
W_x weights. Nothing but the [T] results leaves VMEM.

The warp is augmentation — in training nothing upstream needs its
gradient, so the primal path computes only the output. The custom-vjp
forward runs a second kernel variant that additionally emits ∂out/∂fy
and ∂out/∂fx (tap differences it already holds), making the backward
gather-free: d_coords is an elementwise contraction, d_image is XLA's
4-tap scatter-add.

Border padding only; the "zeros" fade of partops.warp is a pure
function of the coords and is applied outside the kernel.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(img_ref, crd_ref, out_ref, *, h, w, c, tile, with_grads):
    # Continuous pixel-index coords for this tile, [1, T, 2] — points
    # on SUBLANES. Measured tradeoff (r2, B=128): this operand layout
    # makes XLA feed the custom call through a pathological 21 GB/s
    # copy (~1.6 ms), but the [B, 2, N] points-on-LANES alternative was
    # WORSE: the kernel then needs lane→sublane broadcasts of fy/fx
    # against the [T, H] iota and the custom call went 4.7 → 8.2 ms.
    # Net: keep sublane-oriented points (4.7 + 1.6 < 8.2). The
    # TRAINING path avoids the coords operand entirely — see
    # _kernel_tps, which evaluates the TPS flow in-kernel.
    fy = (crd_ref[0, :, 0] + 1.0) * (0.5 * h) - 0.5          # [T]
    fx = (crd_ref[0, :, 1] + 1.0) * (0.5 * w) - 0.5
    _interp_body(img_ref, out_ref, fy, fx, h=h, w=w, c=c, tile=tile,
                 with_grads=with_grads)


def _kernel_tps(img_ref, basis_ref, w_ref, out_ref, *, h, w, c, tile):
    """Fused TPS flow + bilinear sample (the training hot path).

    The flow is Φ_grid @ weights with a STATIC pixel basis (augment/
    tps.py), so instead of shipping a dense [B, N, 2] coords tensor
    (16 MB + a 21 GB/s layout copy at B=128), each program evaluates
    its own tile's coords with one tiny [T, M] @ [M, 2] matmul from a
    shared basis block and the per-sample spline weights (~1 KB).
    """
    # DEFAULT matmul precision (one bf16 MXU pass): jitters the tap
    # coordinates by ~0.1-0.2 px — the same bf16-class jitter the XLA
    # reference's flow einsum carries at TPU defaults, and the noise
    # every r2/r3 quality validation trained through. HIGHEST was
    # measured and REJECTED: the 2-column output pads to 128 MXU lanes,
    # so "tiny [T,M]@[M,2]" is really [T,128]@[128,128]-shaped work and
    # 6 passes cost 7,308 -> 6,015 img/s full-step. Exactness policy +
    # probe method: docs/perf_ledger.md "on-chip kernel parity".
    crd = jnp.dot(
        basis_ref[...], w_ref[0], preferred_element_type=jnp.float32
    )                                                        # [T, 2]
    fy = (crd[:, 0] + 1.0) * (0.5 * h) - 0.5                 # [T]
    fx = (crd[:, 1] + 1.0) * (0.5 * w) - 0.5
    _interp_body(img_ref, out_ref, fy, fx, h=h, w=w, c=c, tile=tile,
                 with_grads=False)


def _kernel_tps_banded(img_ref, basis_ref, w_ref, out_ref, *, h, w, c,
                       tile, kh):
    """Banded fused TPS warp (docs/perf_ledger.md lever #2).

    The unbanded kernel's [T, H] @ [H, C·W] y-interpolation touches all
    H rows although a raster-order point tile (KR = tile/W consecutive
    output rows) reads only a narrow input band: the tile's rows plus
    the TPS displacement VARIATION across it (the global shift is
    absorbed by anchoring the band at the tile's own min row). The band
    start is dynamic (this tile's min tap row, sublane-aligned); its
    HEIGHT kh is static: KR + h/4 + alignment by default — ±h/8 ≈
    ±2.8σ of the default AugmentConfig's across-tile variation
    (rotation·width σ≈0.16 + spline σ≈0.11, normalized). Taps beyond
    the band clamp to its edge — same failure shape as the border
    clamp, affecting only extreme-tail draws; parity vs the unbanded
    kernel on typical draws is tested in tests/partops.
    """
    # DEFAULT matmul precision (one bf16 MXU pass): jitters the tap
    # coordinates by ~0.1-0.2 px — the same bf16-class jitter the XLA
    # reference's flow einsum carries at TPU defaults, and the noise
    # every r2/r3 quality validation trained through. HIGHEST was
    # measured and REJECTED: the 2-column output pads to 128 MXU lanes,
    # so "tiny [T,M]@[M,2]" is really [T,128]@[128,128]-shaped work and
    # 6 passes cost 7,308 -> 6,015 img/s full-step. Exactness policy +
    # probe method: docs/perf_ledger.md "on-chip kernel parity".
    crd = jnp.dot(
        basis_ref[...], w_ref[0], preferred_element_type=jnp.float32
    )                                                        # [T, 2]
    fy = (crd[:, 0] + 1.0) * (0.5 * h) - 0.5                 # [T]
    fx = (crd[:, 1] + 1.0) * (0.5 * w) - 0.5
    y0 = jnp.floor(fy)
    x0 = jnp.floor(fx)
    wy = (fy - y0)[:, None]                                  # [T, 1]
    wx = (fx - x0)[:, None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    start = jnp.clip(jnp.min(y0i), 0, h - kh)
    start = (start // 8) * 8                                 # sublane-aligned
    # Clamp taps into the band (band ⊆ image, so this includes the
    # border clamp).
    y0c = jnp.clip(y0i, start, start + kh - 1)[:, None] - start
    y1c = jnp.clip(y0i + 1, start, start + kh - 1)[:, None] - start
    x0c = jnp.clip(x0i, 0, w - 1)[:, None]
    x1c = jnp.clip(x0i + 1, 0, w - 1)[:, None]

    iota_kh = jax.lax.broadcasted_iota(jnp.int32, (tile, kh), 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (tile, w), 1)
    oh_y0 = (iota_kh == y0c).astype(jnp.float32)             # [T, KH]
    oh_y1 = (iota_kh == y1c).astype(jnp.float32)
    sx0 = (iota_w == x0c).astype(jnp.float32)                # [T, W]
    sx1 = (iota_w == x1c).astype(jnp.float32)
    w_y = oh_y0 + (oh_y1 - oh_y0) * wy
    w_x = sx0 + (sx1 - sx0) * wx

    mt = img_ref.dtype
    band = img_ref[0, pl.ds(start, kh), :]                   # [KH, C*W]
    rows = jnp.dot(w_y.astype(mt), band, preferred_element_type=jnp.float32)
    for ch in range(c):
        seg = rows[:, ch * w : (ch + 1) * w]                 # [T, W]
        out_ref[0, ch] = jnp.sum(w_x * seg, axis=1).astype(out_ref.dtype)


def _interp_body(img_ref, out_ref, fy, fx, *, h, w, c, tile, with_grads):
    y0 = jnp.floor(fy)
    x0 = jnp.floor(fx)
    wy = (fy - y0)[:, None]                                  # [T, 1]
    wx = (fx - x0)[:, None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y0c = jnp.clip(y0i, 0, h - 1)[:, None]
    y1c = jnp.clip(y0i + 1, 0, h - 1)[:, None]
    x0c = jnp.clip(x0i, 0, w - 1)[:, None]
    x1c = jnp.clip(x0i + 1, 0, w - 1)[:, None]

    iota_h = jax.lax.broadcasted_iota(jnp.int32, (tile, h), 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (tile, w), 1)
    oh_y0 = (iota_h == y0c).astype(jnp.float32)              # [T, H]
    oh_y1 = (iota_h == y1c).astype(jnp.float32)
    sx0 = (iota_w == x0c).astype(jnp.float32)                # [T, W]
    sx1 = (iota_w == x1c).astype(jnp.float32)
    # Interpolation weights folded into the selector matrices.
    w_y = oh_y0 + (oh_y1 - oh_y0) * wy                       # [T, H]
    w_x = sx0 + (sx1 - sx0) * wx                             # [T, W]

    # img_ref holds [1, H, C*W] (channel-major rows): ONE [T,H]@[H,C*W]
    # matmul y-interpolates all channels at once; the x-taps reduce per
    # channel on static lane slices.
    #
    # The matmul runs in the IMAGE's dtype: at bf16 the MXU is several
    # times faster than f32, and this kernel IS matmul-bound at 128px
    # (2·N·H·C·W ≈ 1.6 GFLOP/image — the r1 f32 version measured 13 ms
    # at B=128, matching f32 MXU rates). bf16 selector entries {0, 1}
    # are exact; only the folded lerp weights and the image round to
    # 8-bit mantissa — ~1e-3 relative output error, irrelevant for an
    # augmentation producing bf16-consumed encoder inputs. Callers that
    # need exactness (tests, f32 pipelines) pass f32 images and get the
    # bit-exact f32 path.
    mt = img_ref.dtype
    if not with_grads:
        rows = jnp.dot(
            w_y.astype(mt), img_ref[0], preferred_element_type=jnp.float32
        )
        for ch in range(c):
            seg = rows[:, ch * w : (ch + 1) * w]             # [T, W]
            # Store in the output's dtype (bf16 for bf16 images): the
            # [B, 8, N] result tensor and its transpose-out copy halve.
            out_ref[0, ch] = jnp.sum(w_x * seg, axis=1).astype(out_ref.dtype)
    else:
        rows0 = jnp.dot(
            oh_y0.astype(mt), img_ref[0], preferred_element_type=jnp.float32
        )
        rows1 = jnp.dot(
            oh_y1.astype(mt), img_ref[0], preferred_element_type=jnp.float32
        )
        wy1 = wy[:, 0]
        for ch in range(c):
            s0 = rows0[:, ch * w : (ch + 1) * w]
            s1 = rows1[:, ch * w : (ch + 1) * w]
            top = jnp.sum(w_x * s0, axis=1)                  # [T]
            bot = jnp.sum(w_x * s1, axis=1)
            v00 = jnp.sum(sx0 * s0, axis=1)
            v01 = jnp.sum(sx1 * s0, axis=1)
            v10 = jnp.sum(sx0 * s1, axis=1)
            v11 = jnp.sum(sx1 * s1, axis=1)
            out_ref[0, ch] = top + (bot - top) * wy1
            out_ref[0, c + ch] = bot - top
            out_ref[0, 2 * c + ch] = (v01 - v00) + (
                (v11 - v10) - (v01 - v00)
            ) * wy1


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _default_tile(big_ok: bool = False, h: int = 128) -> int:
    """Point-tile size (perf knob; probe with $PARTSEG_WARP_TILE).

    2048 for the generic/f32 paths (4096 overflows the 16 MB scoped
    VMEM there); 4096 for the bf16 TPS training path (measured +1.6%
    full-step: 2443.7 → 2482.5 img/s at B=128).

    Scales down ∝ H beyond 128: scoped VMEM ≈ tile·(H + C·W)·bytes, so
    the tile that fits at 128px blows the 16 MB limit at 256px
    (measured r5: a 4096-tile 256px warp requested 19.19 MB). The env
    override is absolute (no scaling)."""
    import os

    dflt = 4096 if big_ok else 2048
    if h > 128:
        dflt = max(512, dflt * 128 // h)
    return int(os.environ.get("PARTSEG_WARP_TILE", str(dflt)))


def _run_kernel(
    image: jax.Array, coords: jax.Array, interpret: bool, with_grads: bool
):
    """image [B, H, W, C] (any float dtype), coords [B, N, 2] →
    [B, R, N] f32 where R = C (primal) or 3C (out, ∂/∂fy, ∂/∂fx)."""
    b, h, w, c = image.shape
    # Channel-major row layout [B, H, C*W]: one matmul y-interpolates
    # every channel; per-channel x-reduction uses static lane slices.
    # Kept in the image's own dtype: bf16 halves the layout-copy bytes
    # AND unlocks the fast MXU path in the kernel.
    mt = image.dtype if image.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    hcw = jnp.transpose(image, (0, 1, 3, 2)).reshape(b, h, c * w).astype(mt)

    n = coords.shape[1]
    tile = min(_default_tile(h=h), _round_up(n, 128))
    pad_n = _round_up(n, tile)
    if pad_n != n:
        coords = jnp.pad(coords, ((0, 0), (0, pad_n - n), (0, 0)))
    crd = coords.astype(jnp.float32)
    n_rows = 3 * c if with_grads else c
    rows = _round_up(n_rows, 8)
    # Primal output rides in the image's dtype; the grad variant stays
    # f32 (its tap differences feed the backward contraction).
    out_dtype = jnp.float32 if with_grads else mt

    out = pl.pallas_call(
        functools.partial(
            _kernel, h=h, w=w, c=c, tile=tile, with_grads=with_grads
        ),
        grid=(b, pad_n // tile),
        in_specs=[
            pl.BlockSpec((1, h, c * w), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 2), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, tile), lambda i, t: (i, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rows, pad_n), out_dtype),
        interpret=interpret,
    )(hcw, crd)
    return out[:, :n_rows, :n]


def _resolve_interpret(interpret):
    if interpret is None:
        from partseg_tpu.partops.pallas import use_interpret

        return use_interpret()
    return interpret


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def bilinear_sample_fused(
    image: jax.Array, coords: jax.Array, interpret: bool | None = None
) -> jax.Array:
    """Drop-in for partops.warp.bilinear_sample(padding_mode="border").

    image [B, H, W, C], coords [B, N, 2] (y, x in [-1, 1]) → [B, N, C].
    """
    interpret = _resolve_interpret(interpret)
    packed = _run_kernel(image, coords, interpret, with_grads=False)
    return jnp.transpose(packed, (0, 2, 1)).astype(image.dtype)


def _fwd(image, coords, interpret):
    interpret = _resolve_interpret(interpret)
    c = image.shape[-1]
    packed = _run_kernel(image, coords, interpret, with_grads=True)
    out = jnp.transpose(packed[:, :c], (0, 2, 1)).astype(image.dtype)
    d_fy = packed[:, c : 2 * c]                              # [B, C, N]
    d_fx = packed[:, 2 * c : 3 * c]
    # `image` is saved only for its shape/dtype (it is an input, so this
    # keeps no extra memory alive).
    return out, (image, coords, d_fy, d_fx)


def _bwd(interpret, res, g):
    image, coords, d_fy, d_fx = res
    b, h, w, c = image.shape
    gf = g.astype(jnp.float32)                               # [B, N, C]

    # d_coords: elementwise contraction with the saved tap differences.
    gy = jnp.einsum("bnc,bcn->bn", gf, d_fy) * (0.5 * h)
    gx = jnp.einsum("bnc,bcn->bn", gf, d_fx) * (0.5 * w)
    d_coords = jnp.stack([gy, gx], axis=-1).astype(coords.dtype)

    # d_image: 4-tap scatter-add (XLA lowers this well on TPU).
    cf = coords.astype(jnp.float32)
    fy = (cf[..., 0] + 1.0) * (0.5 * h) - 0.5
    fx = (cf[..., 1] + 1.0) * (0.5 * w) - 0.5
    y0 = jnp.floor(fy)
    x0 = jnp.floor(fx)
    wy = (fy - y0)[..., None]
    wx = (fx - x0)[..., None]
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)

    flat = jnp.zeros((b, h * w, c), jnp.float32)
    bidx = jnp.arange(b)[:, None]

    def add(acc, yi, xi, wgt):
        idx = yi * w + xi
        return acc.at[bidx, idx].add(gf * wgt)

    flat = add(flat, y0i, x0i, (1 - wy) * (1 - wx))
    flat = add(flat, y0i, x1i, (1 - wy) * wx)
    flat = add(flat, y1i, x0i, wy * (1 - wx))
    flat = add(flat, y1i, x1i, wy * wx)
    return flat.reshape(b, h, w, c).astype(image.dtype), d_coords


bilinear_sample_fused.defvjp(_fwd, _bwd)


# --------------------------------------------------------------- fused TPS warp


def _run_tps_kernel(image, weights, basis, interpret):
    """image [B,H,W,C], weights [B,M,2], basis [N,M] (N=H*W, static) →
    [B, C_pad_rows, N] sampled values (primal only)."""
    b, h, w, c = image.shape
    mt = image.dtype if image.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    hcw = jnp.transpose(image, (0, 1, 3, 2)).reshape(b, h, c * w).astype(mt)

    n, m = basis.shape
    tile = min(
        _default_tile(big_ok=(mt == jnp.bfloat16), h=h), _round_up(n, 128)
    )
    pad_n = _round_up(n, tile)
    m_pad = _round_up(m, 128)
    # Zero-padded basis columns × zero-padded weight rows change nothing;
    # padded POINT rows produce garbage coords that are sliced away.
    basis_p = jnp.zeros((pad_n, m_pad), jnp.float32)
    basis_p = basis_p.at[:n, :m].set(basis.astype(jnp.float32))
    w_p = jnp.zeros((b, m_pad, 2), jnp.float32)
    w_p = w_p.at[:, :m].set(weights.astype(jnp.float32))

    # Band height via $PARTSEG_WARP_BAND (0 = full-H kernel, the
    # DEFAULT). Banding was the ledger's lever #2, but the r3 A/B on
    # chip measured it SLOWER full-step (kh=72/tile 4096: 7011 vs 7322
    # img/s; kh=48/tile 2048: 6750) — at these shapes the kernel is not
    # MXU-pass-bound, and the dynamic-start band slab costs more than
    # the smaller matmul saves. Kept as a tested experiment for larger
    # images (where H ≫ KH makes the pass cut much bigger). Banding
    # needs raster-order points (n == h*w) so a tile = consecutive rows.
    kh = int(os.environ.get("PARTSEG_WARP_BAND", "0"))
    kh = min(h, _round_up(kh, 8)) if kh else 0
    banded = 0 < kh < h and n == h * w and tile % w == 0 and pad_n == n

    rows = _round_up(c, 8)
    kern = (
        functools.partial(_kernel_tps_banded, h=h, w=w, c=c, tile=tile, kh=kh)
        if banded
        else functools.partial(_kernel_tps, h=h, w=w, c=c, tile=tile)
    )
    out = pl.pallas_call(
        kern,
        grid=(b, pad_n // tile),
        in_specs=[
            pl.BlockSpec((1, h, c * w), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, m_pad), lambda i, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, 2), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, tile), lambda i, t: (i, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rows, pad_n), mt),
        interpret=interpret,
    )(hcw, basis_p, w_p)
    return out[:, :c, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def tps_warp_fused(
    image: jax.Array,
    weights: jax.Array,
    basis: jax.Array,
    interpret: bool | None = None,
) -> jax.Array:
    """Warp an image batch with TPS spline weights in ONE fused kernel.

    image [B, H, W, C]; weights [B, M, 2] (augment.tps.TPSParams rows);
    basis [H*W, M] — the static Φ_grid = [U(‖u−cᵢ‖), 1, y, x] pixel
    basis (TPSSampler.flow_basis). Returns [B, H, W, C].

    The coords never exist as an HBM tensor: each kernel program
    derives its tile's flow from the basis block + weights. Gradients
    (rarely needed — training stop-grads augmentation) fall back to
    the explicit flow + bilinear_sample_fused path.
    """
    interpret = _resolve_interpret(interpret)
    b, h, w, c = image.shape
    packed = _run_tps_kernel(image, weights, basis, interpret)
    return (
        jnp.transpose(packed, (0, 2, 1))
        .reshape(b, h, w, c)
        .astype(image.dtype)
    )


def _tps_flow(weights, basis):
    return jnp.einsum(
        "nm,bmk->bnk", basis, weights, preferred_element_type=jnp.float32
    )


def _tps_fwd(image, weights, basis, interpret):
    return tps_warp_fused(image, weights, basis, interpret), (image, weights, basis)


def _tps_bwd(interpret, res, g):
    image, weights, basis = res
    b, h, w, c = image.shape

    def ref(img, wts):
        coords = _tps_flow(wts, basis)
        return bilinear_sample_fused(img, coords, interpret).reshape(
            b, h, w, c
        )

    _, vjp = jax.vjp(ref, image, weights)
    d_image, d_weights = vjp(g)
    return d_image, d_weights, None


tps_warp_fused.defvjp(_tps_fwd, _tps_bwd)
