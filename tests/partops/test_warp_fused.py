"""Fused Pallas bilinear warp vs the XLA-gather reference."""

import jax
import jax.numpy as jnp
import numpy as np

from partseg_tpu.partops import bilinear_sample, coord_grid, warp_image
from partseg_tpu.partops.pallas import bilinear_sample_fused


def _coords(key, b, n, lo=-1.2, hi=1.2):
    return jax.random.uniform(key, (b, n, 2), minval=lo, maxval=hi)


def test_fused_matches_gather_border():
    img = jax.random.uniform(jax.random.key(0), (2, 16, 24, 3))
    crd = _coords(jax.random.key(1), 2, 100)
    got = bilinear_sample_fused(img, crd)
    want = bilinear_sample(img, crd, "border", impl="gather")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_matches_gather_zeros_mode():
    img = jax.random.uniform(jax.random.key(2), (1, 8, 8, 2))
    crd = _coords(jax.random.key(3), 1, 64, lo=-2.0, hi=2.0)
    got = bilinear_sample(img, crd, "zeros", impl="fused")
    want = bilinear_sample(img, crd, "zeros", impl="gather")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_grads_match_gather():
    img = jax.random.uniform(jax.random.key(4), (1, 8, 12, 3))
    crd = _coords(jax.random.key(5), 1, 50, lo=-0.9, hi=0.9)
    g = jax.random.normal(jax.random.key(6), (1, 50, 3))

    def f_fused(im, cr):
        return jnp.sum(bilinear_sample_fused(im, cr) * g)

    def f_ref(im, cr):
        return jnp.sum(bilinear_sample(im, cr, "border", impl="gather") * g)

    gi1, gc1 = jax.grad(f_fused, argnums=(0, 1))(img, crd)
    gi2, gc2 = jax.grad(f_ref, argnums=(0, 1))(img, crd)
    np.testing.assert_allclose(np.asarray(gi1), np.asarray(gi2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc1), np.asarray(gc2), atol=1e-4)


def test_fused_identity_warp():
    img = jax.random.uniform(jax.random.key(7), (2, 8, 8, 3))
    yy, xx = coord_grid(8, 8)
    coords = jnp.broadcast_to(
        jnp.stack([yy, xx], -1)[None], (2, 8, 8, 2)
    )
    out = warp_image(img, coords, impl="fused")
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_fused_nonsquare_and_nonmultiple_n():
    # N not a multiple of the tile exercises the padding path.
    img = jax.random.uniform(jax.random.key(8), (1, 10, 6, 1))
    crd = _coords(jax.random.key(9), 1, 37)
    got = bilinear_sample_fused(img, crd)
    want = bilinear_sample(img, crd, "border", impl="gather")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_bf16_fast_path_close_to_f32():
    # The bf16 MXU fast path (train-step augmentation) must stay within
    # bf16 rounding of the exact f32 gather reference: selector entries
    # are exact in bf16, only image values + lerp weights round.
    img = jax.random.uniform(jax.random.key(4), (2, 16, 24, 3))
    crd = _coords(jax.random.key(5), 2, 100)
    got = bilinear_sample_fused(img.astype(jnp.bfloat16), crd)
    assert got.dtype == jnp.bfloat16
    want = bilinear_sample(img, crd, "border", impl="gather")
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=2e-2
    )


def test_tps_warp_fused_matches_flow_path():
    # The fully-fused TPS warp (flow evaluated IN-kernel from the
    # static basis + spline weights) must equal building the dense flow
    # and sampling it.
    from partseg_tpu.augment.tps import TPSSampler
    from partseg_tpu.partops.pallas import tps_warp_fused

    sampler = TPSSampler(grid_size=4)
    img = jax.random.uniform(jax.random.key(6), (2, 16, 24, 3))
    params = sampler.sample(jax.random.key(7), 2)
    want = sampler.warp(params, img, impl="gather")
    got = tps_warp_fused(img, params.weights, sampler.flow_basis(16, 24))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_tps_warp_fused_grads():
    # Gradients route through the explicit-flow fallback; they must be
    # finite and match differentiating the flow path directly.
    from partseg_tpu.augment.tps import TPSSampler
    from partseg_tpu.partops.pallas import tps_warp_fused

    sampler = TPSSampler(grid_size=3)
    img = jax.random.uniform(jax.random.key(8), (1, 12, 12, 2))
    params = sampler.sample(jax.random.key(9), 1)
    basis = sampler.flow_basis(12, 12)

    g1 = jax.grad(
        lambda im, wt: jnp.sum(tps_warp_fused(im, wt, basis) ** 2),
        argnums=(0, 1),
    )(img, params.weights)
    g2 = jax.grad(
        lambda im, wt: jnp.sum(
            sampler.warp(
                type(params)(weights=wt), im, impl="gather"
            ).astype(jnp.float32) ** 2
        ),
        argnums=(0, 1),
    )(img, params.weights)
    for a, b in zip(g1, g2):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_tps_warp_banded_matches_flow_path(monkeypatch):
    # The BANDED fused TPS kernel (dynamic y-band anchored at the
    # tile's own min tap row; env-gated experiment, off by default
    # after the r3 full-step A/B) must match the dense-flow reference
    # exactly on typical sampler draws.
    from partseg_tpu.augment.tps import TPSSampler
    from partseg_tpu.partops.pallas import tps_warp_fused

    monkeypatch.setenv("PARTSEG_WARP_BAND", "56")
    sampler = TPSSampler(grid_size=4)
    img = jax.random.uniform(jax.random.key(10), (2, 64, 64, 3))
    params = sampler.sample(jax.random.key(11), 2)
    want = sampler.warp(params, img, impl="gather")
    got = tps_warp_fused(img, params.weights, sampler.flow_basis(64, 64))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_tps_warp_banded_extreme_draw_clamps_finite(monkeypatch):
    # A pathologically large draw can push taps outside the band; they
    # clamp to the band edge (border-clamp failure shape) — output must
    # stay finite and within the image's value range, never garbage.
    from partseg_tpu.augment.tps import TPSSampler
    from partseg_tpu.partops.pallas import tps_warp_fused

    monkeypatch.setenv("PARTSEG_WARP_BAND", "40")   # deliberately tight
    sampler = TPSSampler(grid_size=4, scale_sd=0.5, rot_sd=0.5,
                         trans_sd=0.5, ctrl_sd=0.5)
    img = jax.random.uniform(jax.random.key(12), (1, 64, 64, 3))
    params = sampler.sample(jax.random.key(13), 1)
    out = np.asarray(tps_warp_fused(img, params.weights,
                                    sampler.flow_basis(64, 64)))
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 - 1e-5 and out.max() <= 1.0 + 1e-5
