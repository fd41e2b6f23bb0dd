"""Tests for appearance pooling, decoder assembly, and bilinear warp."""

import jax
import jax.numpy as jnp
import numpy as np

from partseg_tpu.partops import (
    assemble_decoder_input,
    bilinear_sample,
    coord_grid,
    pool_appearance,
    warp_image,
)


def test_pool_appearance_uniform_mask_is_mean():
    feats = jax.random.normal(jax.random.key(0), (2, 8, 8, 16))
    parts = jnp.ones((2, 8, 8, 3))
    a = pool_appearance(feats, parts)
    want = jnp.mean(feats, axis=(1, 2))[:, None, :]
    np.testing.assert_allclose(
        np.asarray(a), np.broadcast_to(np.asarray(want), a.shape), atol=1e-5
    )


def test_pool_appearance_one_hot_mask_selects_pixel():
    feats = jax.random.normal(jax.random.key(1), (1, 4, 4, 8))
    parts = np.zeros((1, 4, 4, 1), np.float32)
    parts[0, 2, 3, 0] = 1.0
    a = pool_appearance(feats, jnp.asarray(parts))
    np.testing.assert_allclose(np.asarray(a[0, 0]), np.asarray(feats[0, 2, 3]), atol=1e-5)


def test_assemble_matches_naive_outer_product():
    blobs = jax.random.uniform(jax.random.key(2), (2, 6, 6, 4))
    app = jax.random.normal(jax.random.key(3), (2, 4, 8))
    got = assemble_decoder_input(blobs, app)
    want = jnp.einsum("bhwk,bkc->bhwc", blobs, app)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def _identity_coords(b, h, w):
    yy, xx = coord_grid(h, w)
    g = jnp.stack([yy, xx], axis=-1)[None]
    return jnp.broadcast_to(g, (b, h, w, 2))


def test_warp_identity_flow_is_identity():
    # Property (SURVEY.md §4.1): warp of identity flow is identity.
    img = jax.random.uniform(jax.random.key(4), (2, 16, 12, 3))
    out = warp_image(img, _identity_coords(2, 16, 12))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_warp_integer_shift():
    # Shifting sampling coords by exactly one pixel row reproduces a roll.
    h, w = 8, 8
    img = jax.random.uniform(jax.random.key(5), (1, h, w, 2))
    coords = _identity_coords(1, h, w)
    shifted = coords.at[..., 0].add(2.0 / h)  # sample one row DOWN
    out = warp_image(img, shifted)
    np.testing.assert_allclose(
        np.asarray(out[0, :-1]), np.asarray(img[0, 1:]), atol=1e-5
    )


def test_bilinear_midpoint_interpolation():
    # Sampling halfway between two pixels averages them.
    img = jnp.zeros((1, 1, 2, 1)).at[0, 0, 0, 0].set(1.0).at[0, 0, 1, 0].set(3.0)
    # x midpoint between centers of col 0 and col 1 is x=0 in [-1,1] (W=2).
    out = bilinear_sample(img, jnp.array([[[0.0, 0.0]]]))
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], 2.0, atol=1e-5)


def test_warp_zeros_padding_outside():
    img = jnp.ones((1, 8, 8, 1))
    coords = jnp.full((1, 4, 4, 2), 5.0)  # far outside
    out = warp_image(img, coords, padding_mode="zeros")
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_warp_grads_flow_to_image_and_coords():
    img = jax.random.uniform(jax.random.key(6), (1, 8, 8, 1))
    coords = _identity_coords(1, 8, 8) * 0.9

    gi = jax.grad(lambda im: jnp.sum(warp_image(im, coords) ** 2))(img)
    gc = jax.grad(lambda cr: jnp.sum(warp_image(img, cr) ** 2))(coords)
    assert np.all(np.isfinite(np.asarray(gi))) and float(jnp.abs(gi).sum()) > 0
    assert np.all(np.isfinite(np.asarray(gc)))
