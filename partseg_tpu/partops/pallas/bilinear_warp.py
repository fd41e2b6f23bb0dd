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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(img_ref, crd_ref, out_ref, *, h, w, c, tile, with_grads):
    # Continuous pixel-index coords for this tile. crd_ref is [1, 2, T]
    # — points on the LANE dim. (The obvious [B, N, 2] operand forces a
    # lane-dim-2 layout on the custom call; XLA materialized it through
    # a 21 GB/s pathological copy, 1.6 ms/step at B=128.)
    fy = (crd_ref[0, 0, :] + 1.0) * (0.5 * h) - 0.5          # [T]
    fx = (crd_ref[0, 1, :] + 1.0) * (0.5 * w) - 0.5
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
    tile = min(2048, _round_up(n, 128))
    pad_n = _round_up(n, tile)
    if pad_n != n:
        coords = jnp.pad(coords, ((0, 0), (0, pad_n - n), (0, 0)))
    # [B, 2, N]: a cheap explicit transpose into the natural layout the
    # kernel wants (see _kernel's crd_ref comment).
    crd = jnp.swapaxes(coords.astype(jnp.float32), 1, 2)
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
            pl.BlockSpec((1, 2, tile), lambda i, t: (i, 0, t),
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
