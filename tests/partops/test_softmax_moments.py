"""Unit + property tests for part normalizations and soft-argmax moments."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from partseg_tpu.partops import (
    chol2x2,
    coord_grid,
    normalize_maps,
    part_softmax,
    precision_from_cov,
    render_gaussians,
    soft_argmax_moments,
    spatial_softmax,
)


def test_part_softmax_sums_to_one_over_parts():
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 5))
    p = part_softmax(x)
    np.testing.assert_allclose(np.sum(np.asarray(p), axis=-1), 1.0, rtol=1e-5)


def test_spatial_softmax_sums_to_one_over_pixels():
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 5))
    p = spatial_softmax(x)
    np.testing.assert_allclose(np.sum(np.asarray(p), axis=(1, 2)), 1.0, rtol=1e-5)


def test_normalize_maps_matches_spatial_softmax_of_log():
    x = jax.random.uniform(jax.random.key(2), (1, 6, 6, 3)) + 0.1
    a = normalize_maps(x)
    b = spatial_softmax(jnp.log(x))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_moments_of_delta_distribution():
    # All mass on one pixel -> mu == that pixel's coords, sigma == 0.
    h = w = 16
    p = np.zeros((1, h, w, 1), np.float32)
    p[0, 3, 12, 0] = 1.0
    mu, sigma = soft_argmax_moments(jnp.asarray(p))
    yy, xx = coord_grid(h, w)
    np.testing.assert_allclose(mu[0, 0, 0], yy[3, 12], atol=1e-6)
    np.testing.assert_allclose(mu[0, 0, 1], xx[3, 12], atol=1e-6)
    np.testing.assert_allclose(np.asarray(sigma), 0.0, atol=1e-6)


def test_moments_recover_rendered_gaussian():
    # Property (SURVEY.md §4.1): moments of a rendered Gaussian recover (mu, sigma).
    h = w = 64
    mu = jnp.array([[[0.1, -0.2]]], jnp.float32)                  # [1,1,2]
    sigma = jnp.array([[[[0.02, 0.005], [0.005, 0.03]]]], jnp.float32)
    blob = render_gaussians(mu, sigma, h, w)                      # [1,H,W,1]
    p = normalize_maps(blob)
    mu2, sigma2 = soft_argmax_moments(p)
    np.testing.assert_allclose(np.asarray(mu2), np.asarray(mu), atol=5e-3)
    np.testing.assert_allclose(np.asarray(sigma2), np.asarray(sigma), atol=5e-3)


def test_precision_is_inverse():
    key = jax.random.key(3)
    a = jax.random.normal(key, (4, 3, 2, 2))
    sigma = jnp.einsum("...ij,...kj->...ik", a, a) + 0.05 * jnp.eye(2)
    lam = precision_from_cov(sigma, eps=0.0)
    prod = jnp.einsum("...ij,...jk->...ik", sigma, lam)
    np.testing.assert_allclose(
        np.asarray(prod), np.broadcast_to(np.eye(2), prod.shape), atol=1e-4
    )


def test_chol2x2_reconstructs():
    a = jax.random.normal(jax.random.key(4), (5, 2, 2))
    sigma = jnp.einsum("...ij,...kj->...ik", a, a) + 0.1 * jnp.eye(2)
    L = chol2x2(sigma, eps=0.0)
    rec = jnp.einsum("...ij,...kj->...ik", L, L)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(sigma), atol=1e-4)


@pytest.mark.parametrize("kernel", ["gauss", "heavy_tail"])
def test_render_peak_at_mu(kernel):
    h = w = 32
    mu = jnp.array([[[-0.5, 0.25]]], jnp.float32)
    sigma = 0.01 * jnp.broadcast_to(jnp.eye(2), (1, 1, 2, 2))
    blob = np.asarray(render_gaussians(mu, sigma, h, w, kernel=kernel))[0, :, :, 0]
    iy, ix = np.unravel_index(np.argmax(blob), blob.shape)
    yy, xx = coord_grid(h, w)
    assert abs(float(yy[iy, ix]) - (-0.5)) < 2.0 / h
    assert abs(float(xx[iy, ix]) - 0.25) < 2.0 / w
    assert blob.max() <= 1.0 + 1e-6


def test_moments_grad_finite():
    def loss(logits):
        p = spatial_softmax(logits)
        mu, sigma = soft_argmax_moments(p)
        return jnp.sum(mu**2) + jnp.sum(sigma**2)

    g = jax.grad(loss)(jax.random.normal(jax.random.key(5), (1, 8, 8, 2)))
    assert np.all(np.isfinite(np.asarray(g)))
