"""Parity + gradient tests: Pallas fused kernels vs pure-jnp references
(SURVEY.md §4.1). Run in interpret mode on the CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from partseg_tpu.partops import (
    assemble_decoder_input,
    precision_from_cov,
    render_gaussians,
    soft_argmax_moments,
    spatial_softmax,
)
from partseg_tpu.partops.pallas import render_assemble, softmax_moments


def _random_mu_sigma(key, b, k):
    k1, k2 = jax.random.split(key)
    mu = jax.random.uniform(k1, (b, k, 2), minval=-0.7, maxval=0.7)
    a = jax.random.normal(k2, (b, k, 2, 2)) * 0.1
    sigma = jnp.einsum("...ij,...kj->...ik", a, a) + 0.01 * jnp.eye(2)
    return mu, sigma


@pytest.mark.parametrize("kernel", ["gauss", "heavy_tail"])
def test_render_assemble_matches_reference(kernel):
    b, k, c, h, w = 2, 5, 7, 16, 32
    mu, sigma = _random_mu_sigma(jax.random.key(0), b, k)
    lam = precision_from_cov(sigma)
    app = jax.random.normal(jax.random.key(1), (b, k, c))

    got = render_assemble(mu, lam, app, h, w, kernel)
    blobs = render_gaussians(mu, sigma, h, w, kernel=kernel, precision=lam)
    want = assemble_decoder_input(blobs, app)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_render_assemble_grads_match_reference():
    b, k, c, h, w = 1, 3, 4, 8, 16
    mu, sigma = _random_mu_sigma(jax.random.key(2), b, k)
    lam = precision_from_cov(sigma)
    app = jax.random.normal(jax.random.key(3), (b, k, c))
    gref = jax.random.normal(jax.random.key(4), (b, h, w, c))

    def fused(mu, lam, app):
        return jnp.sum(render_assemble(mu, lam, app, h, w, "gauss") * gref)

    def ref(mu, lam, app):
        blobs = render_gaussians(
            mu, jnp.zeros_like(lam), h, w, kernel="gauss", precision=lam
        )
        return jnp.sum(assemble_decoder_input(blobs, app) * gref)

    g1 = jax.grad(fused, argnums=(0, 1, 2))(mu, lam, app)
    g2 = jax.grad(ref, argnums=(0, 1, 2))(mu, lam, app)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_softmax_moments_matches_reference():
    b, h, w, k = 2, 8, 16, 6
    logits = jax.random.normal(jax.random.key(5), (b, h, w, k)) * 3.0
    parts_f, mu_f, sigma_f = softmax_moments(logits)
    parts_r = spatial_softmax(logits)
    mu_r, sigma_r = soft_argmax_moments(parts_r)
    np.testing.assert_allclose(np.asarray(parts_f), np.asarray(parts_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mu_f), np.asarray(mu_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sigma_f), np.asarray(sigma_r), atol=1e-5)


def test_softmax_moments_grads_match_reference():
    b, h, w, k = 1, 8, 8, 3
    logits = jax.random.normal(jax.random.key(6), (b, h, w, k))
    gp = jax.random.normal(jax.random.key(7), (b, h, w, k))
    gm = jax.random.normal(jax.random.key(8), (b, k, 2))
    gs = jax.random.normal(jax.random.key(9), (b, k, 2, 2))

    def fused(x):
        p, m, s = softmax_moments(x)
        return jnp.sum(p * gp) + jnp.sum(m * gm) + jnp.sum(s * gs)

    def ref(x):
        p = spatial_softmax(x)
        m, s = soft_argmax_moments(p)
        return jnp.sum(p * gp) + jnp.sum(m * gm) + jnp.sum(s * gs)

    g1 = jax.grad(fused)(logits)
    g2 = jax.grad(ref)(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_render_assemble_padded_parts_contribute_nothing():
    # K not a multiple of 128 exercises the padding path by construction;
    # compare K=1 against K=1 embedded among zero-appearance parts.
    h = w = 8
    mu, sigma = _random_mu_sigma(jax.random.key(10), 1, 1)
    lam = precision_from_cov(sigma)
    app = jnp.ones((1, 1, 4))
    out1 = render_assemble(mu, lam, app, h, w, "gauss")

    mu3 = jnp.concatenate([mu, jnp.zeros((1, 2, 2))], axis=1)
    lam3 = jnp.concatenate(
        [lam, jnp.broadcast_to(jnp.eye(2), (1, 2, 2, 2))], axis=1
    )
    app3 = jnp.concatenate([app, jnp.zeros((1, 2, 4))], axis=1)
    out3 = render_assemble(mu3, lam3, app3, h, w, "gauss")
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out3), atol=1e-6)
