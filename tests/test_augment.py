"""Tests for the TPS warp sampler and color jitter."""

import jax
import jax.numpy as jnp
import numpy as np

from partseg_tpu.augment import (
    AugmentConfig,
    TPSSampler,
    color_jitter,
    make_pair,
    sample_color_params,
)
from partseg_tpu.augment.color import ColorParams
from partseg_tpu.partops import coord_grid


def _grid_points(h, w):
    yy, xx = coord_grid(h, w)
    return jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)


def test_identity_params_transform_points_is_identity():
    s = TPSSampler(grid_size=4)
    params = s.identity(2)
    pts = jnp.broadcast_to(_grid_points(8, 8)[None], (2, 64, 2))
    out = s.transform_points(params, pts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-4)


def test_identity_params_warp_is_identity():
    s = TPSSampler(grid_size=5)
    img = jax.random.uniform(jax.random.key(0), (2, 16, 16, 3))
    out = s.warp(s.identity(2), img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-3)


def test_flow_field_matches_transform_points():
    s = TPSSampler(grid_size=5)
    params = s.sample(jax.random.key(1), 3)
    flow = s.flow_field(params, 12, 10)                     # [3, 12, 10, 2]
    pts = jnp.broadcast_to(_grid_points(12, 10)[None], (3, 120, 2))
    want = s.transform_points(params, pts).reshape(3, 12, 10, 2)
    np.testing.assert_allclose(np.asarray(flow), np.asarray(want), atol=1e-5)


def test_similarity_only_is_exact_similarity():
    # With ctrl_sd=0 the TPS must reproduce the global similarity exactly
    # (similarity transforms are in the span of the affine TPS part).
    s = TPSSampler(grid_size=4, scale_sd=0.2, rot_sd=0.3, trans_sd=0.2, ctrl_sd=0.0)
    key = jax.random.key(2)
    params = s.sample(key, 4)
    # Recover the similarity the sampler drew, from the same key stream.
    k1, k2, k3, k4 = jax.random.split(key, 4)
    scale = jnp.exp(jax.random.normal(k1, (4,)) * 0.2)
    theta = jax.random.normal(k2, (4,)) * 0.3
    trans = jax.random.normal(k3, (4, 2)) * 0.2
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.stack([jnp.stack([cos, -sin], -1), jnp.stack([sin, cos], -1)], -2)

    pts = jnp.broadcast_to(_grid_points(6, 6)[None], (4, 36, 2))
    got = s.transform_points(params, pts)
    want = (
        jnp.einsum("b,bij,bpj->bpi", scale, rot, pts) + trans[:, None, :]
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def test_jacobian_matches_autodiff():
    s = TPSSampler(grid_size=5)
    params = s.sample(jax.random.key(3), 2)
    pts = jax.random.uniform(jax.random.key(4), (2, 7, 2), minval=-0.8, maxval=0.8)
    j_analytic = s.jacobian(params, pts)

    def t_single(p, w):
        from partseg_tpu.augment.tps import TPSParams

        return s.transform_points(TPSParams(w), p[None, None, :])[0, 0]

    j_auto = jax.vmap(
        lambda ps, w: jax.vmap(lambda p: jax.jacfwd(t_single)(p, w))(ps)
    )(pts, params.weights)
    np.testing.assert_allclose(
        np.asarray(j_analytic), np.asarray(j_auto), atol=1e-4
    )


def test_warp_moves_content_consistently_with_transform():
    # A bright dot at x-frame location p must appear in the warped image at
    # u* with T(u*) = p. Verify at the argmax of the warped image.
    s = TPSSampler(grid_size=5, scale_sd=0.05, rot_sd=0.05, trans_sd=0.05, ctrl_sd=0.03)
    h = w = 64
    img = np.zeros((1, h, w, 1), np.float32)
    img[0, 20:24, 40:44, 0] = 1.0
    params = s.sample(jax.random.key(5), 1)
    warped = np.asarray(s.warp(params, jnp.asarray(img), padding_mode="zeros"))
    iy, ix = np.unravel_index(np.argmax(warped[0, :, :, 0]), (h, w))
    yy, xx = coord_grid(h, w)
    u_star = jnp.array([[[float(yy[iy, ix]), float(xx[iy, ix])]]])
    p_pred = np.asarray(s.transform_points(params, u_star))[0, 0]
    # Center of the dot in normalized coords:
    p_true = np.array([float(yy[21, 41]), float(xx[21, 41])])
    assert np.abs(p_pred - p_true).max() < 0.08, (p_pred, p_true)


def test_color_jitter_identity_params():
    img = jax.random.uniform(jax.random.key(6), (2, 8, 8, 3))
    z = jnp.zeros((2,))
    o = jnp.ones((2,))
    out = color_jitter(img, ColorParams(brightness=z, contrast=o, saturation=o, hue=z))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_color_jitter_stays_in_range_and_varies():
    img = jax.random.uniform(jax.random.key(7), (4, 8, 8, 3))
    params = sample_color_params(jax.random.key(8), 4)
    out = np.asarray(color_jitter(img, params))
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert np.abs(out - np.asarray(img)).max() > 1e-3


def test_make_pair_shapes_and_determinism():
    cfg = AugmentConfig()
    sampler = cfg.make_sampler()
    img = jax.random.uniform(jax.random.key(9), (2, 32, 32, 3))
    p1 = make_pair(img, jax.random.key(42), sampler, cfg)
    p2 = make_pair(img, jax.random.key(42), sampler, cfg)
    assert p1["x_s"].shape == img.shape and p1["x_a"].shape == img.shape
    np.testing.assert_allclose(np.asarray(p1["x_s"]), np.asarray(p2["x_s"]))
    np.testing.assert_allclose(
        np.asarray(p1["tps"].weights), np.asarray(p2["tps"].weights)
    )
    # The two views differ from each other and from the input.
    assert np.abs(np.asarray(p1["x_s"]) - np.asarray(img)).max() > 1e-3
    assert np.abs(np.asarray(p1["x_a"]) - np.asarray(img)).max() > 1e-3


def test_make_pair_jits():
    cfg = AugmentConfig()
    sampler = cfg.make_sampler()
    img = jax.random.uniform(jax.random.key(10), (2, 16, 16, 3))

    @jax.jit
    def f(x, key):
        return make_pair(x, key, sampler, cfg)["x_s"]

    out = f(img, jax.random.key(0))
    assert out.shape == img.shape


def test_make_pair_warp_on_static():
    # AugmentConfig.warp_every support (trace-time specialization):
    # warp_on=False builds the off-step graph — no warp at all (x_s is
    # bit-for-bit the input) and the EXACT identity transform so
    # equivariance transport matches what was applied; warp_on=True is
    # the default graph, bit-for-bit.
    cfg = AugmentConfig()
    sampler = cfg.make_sampler()
    img = jax.random.uniform(jax.random.key(11), (2, 32, 32, 3))
    key = jax.random.key(7)

    off = make_pair(img, key, sampler, cfg, warp_on=False)
    np.testing.assert_array_equal(np.asarray(off["x_s"]), np.asarray(img))
    ident = sampler.identity(2)
    np.testing.assert_allclose(
        np.asarray(off["tps"].weights), np.asarray(ident.weights), atol=1e-6
    )
    # Identity transport really is the identity on points.
    pts = jax.random.uniform(jax.random.key(3), (2, 5, 2), minval=-1, maxval=1)
    np.testing.assert_allclose(
        np.asarray(sampler.transform_points(off["tps"], pts)),
        np.asarray(pts), atol=1e-5,
    )
    # Color jitter still applies on off-steps — with the SAME draws as
    # the on-graph (independent key split).
    assert np.abs(np.asarray(off["x_a"]) - np.asarray(img)).max() > 1e-3

    # warp_on=True IS the default path, bit-for-bit.
    on = make_pair(img, key, sampler, cfg, warp_on=True)
    ref = make_pair(img, key, sampler, cfg)
    np.testing.assert_array_equal(
        np.asarray(on["x_s"]), np.asarray(ref["x_s"])
    )
    np.testing.assert_array_equal(
        np.asarray(on["tps"].weights), np.asarray(ref["tps"].weights)
    )
    np.testing.assert_array_equal(np.asarray(on["x_a"]), np.asarray(ref["x_a"]))
    # On/off color draws agree (rng consistency across the two graphs).
    np.testing.assert_array_equal(np.asarray(off["x_a"]), np.asarray(ref["x_a"]))


def test_make_pair_warp_fraction():
    # AugmentConfig.warp_fraction: only the first ceil(B·f) samples get
    # the TPS warp (at 1/f kernel cost); the tail passes through with
    # the EXACT identity transform. Every step keeps true-warp
    # equivariance pairs — the per-sample analog of warp_every.
    cfg = AugmentConfig(warp_fraction=0.5)
    sampler = cfg.make_sampler()
    b = 4
    img = jax.random.uniform(jax.random.key(12), (b, 32, 32, 3))
    key = jax.random.key(13)

    out = make_pair(img, key, sampler, cfg)
    full = make_pair(img, key, sampler, AugmentConfig())
    # Head: bit-for-bit the full-warp result (same draws — the split is
    # a trace-time slice after sampling).
    np.testing.assert_array_equal(
        np.asarray(out["x_s"][:2]), np.asarray(full["x_s"][:2])
    )
    np.testing.assert_array_equal(
        np.asarray(out["tps"].weights[:2]), np.asarray(full["tps"].weights[:2])
    )
    # Tail: untouched images + exact identity transform.
    np.testing.assert_array_equal(np.asarray(out["x_s"][2:]), np.asarray(img[2:]))
    np.testing.assert_allclose(
        np.asarray(out["tps"].weights[2:]),
        np.asarray(sampler.identity(2).weights),
        atol=1e-6,
    )
    pts = jax.random.uniform(jax.random.key(3), (2, 5, 2), minval=-1, maxval=1)
    np.testing.assert_allclose(
        np.asarray(sampler.transform_points(
            jax.tree.map(lambda w: w[2:], out["tps"]), pts)),
        np.asarray(pts), atol=1e-5,
    )
    # Color jitter is fraction-independent (full batch, same draws).
    np.testing.assert_array_equal(np.asarray(out["x_a"]), np.asarray(full["x_a"]))

    # Jits, and rounds up (f=0.3 of 4 → 2 warped samples).
    cfg3 = AugmentConfig(warp_fraction=0.3)

    @jax.jit
    def f(x, k):
        return make_pair(x, k, sampler, cfg3)["x_s"]

    xs = f(img, key)
    assert np.abs(np.asarray(xs[:2]) - np.asarray(img[:2])).max() > 1e-3
    np.testing.assert_array_equal(np.asarray(xs[2:]), np.asarray(img[2:]))

    # warp_on=False (warp_every off-step) overrides the fraction: no
    # warp at all.
    off = make_pair(img, key, sampler, cfg, warp_on=False)
    np.testing.assert_array_equal(np.asarray(off["x_s"]), np.asarray(img))

    import pytest

    with pytest.raises(ValueError):
        make_pair(img, key, sampler, AugmentConfig(warp_fraction=0.0))
