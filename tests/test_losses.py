"""Tests for VGG perceptual and equivariance losses."""

import numpy as np
import jax
import jax.numpy as jnp

from partseg_tpu.augment import TPSSampler
from partseg_tpu.losses import (
    PerceptualLoss,
    VGG19Features,
    equivariance_loss,
    random_vgg19_params,
)
from partseg_tpu.partops import normalize_maps, render_gaussians, soft_argmax_moments


def test_vgg_feature_shapes_and_trim():
    m = VGG19Features(extract=("relu1_2", "relu3_2"), trim_blocks=3)
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.key(0), x)
    feats = m.apply(params, x)
    assert feats["relu1_2"].shape == (1, 64, 64, 64)
    assert feats["relu3_2"].shape == (1, 16, 16, 256)
    # Deepest requested layer bounds compute: conv4/conv5 params must not exist.
    names = set(params["params"].keys())
    assert "conv4_1" not in names and "conv3_3" not in names


def test_perceptual_loss_zero_on_identical_positive_otherwise():
    model = VGG19Features(extract=("relu1_2", "relu2_2"))
    vgg_params = random_vgg19_params(model.copy(), 32)
    loss = PerceptualLoss(vgg_params, extract=("relu1_2", "relu2_2"))
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3))
    z = loss(x, x)
    assert abs(float(z)) < 1e-5
    y = jax.random.uniform(jax.random.key(2), (2, 32, 32, 3))
    assert float(loss(y, x)) > 1e-3


def test_perceptual_loss_grad_finite():
    vgg_params = random_vgg19_params(VGG19Features(extract=("relu1_2",)), 16)
    loss = PerceptualLoss(vgg_params, extract=("relu1_2",))
    x = jax.random.uniform(jax.random.key(3), (1, 16, 16, 3))
    g = jax.grad(lambda a: loss(a, x))(x * 0.5)
    assert np.all(np.isfinite(np.asarray(g)))


def test_equivariance_zero_under_identity():
    # SURVEY.md §4.1 property: equivariance loss is 0 under identity transform.
    s = TPSSampler(grid_size=4)
    tps = s.identity(2)
    mu = jax.random.uniform(jax.random.key(4), (2, 3, 2), minval=-0.5, maxval=0.5)
    a = jax.random.normal(jax.random.key(5), (2, 3, 2, 2)) * 0.1
    sigma = jnp.einsum("...ij,...kj->...ik", a, a) + 0.01 * jnp.eye(2)
    loss, metrics = equivariance_loss(s, tps, mu, sigma, mu, sigma)
    assert float(loss) < 1e-4, float(loss)


def test_equivariance_consistent_with_actual_heatmap_warp():
    # Render a Gaussian part, warp the heatmap exactly like an image, and
    # check the analytic (T, J) transport matches the warped-map moments.
    s = TPSSampler(grid_size=5, scale_sd=0.05, rot_sd=0.05, trans_sd=0.05, ctrl_sd=0.02)
    tps = s.sample(jax.random.key(6), 1)
    h = w = 96
    # "Original frame" part: build its heatmap in x-frame.
    mu_a = jnp.array([[[0.1, -0.15]]])
    sigma_a = jnp.array([[[[0.02, 0.004], [0.004, 0.015]]]])
    heat_x = render_gaussians(mu_a, sigma_a, h, w)             # x-frame map
    # The warped view samples x at T(u): warping the heatmap the same way
    # gives the part as seen in the warped view.
    heat_s = s.warp(tps, heat_x, padding_mode="zeros")
    mu_s, sigma_s = soft_argmax_moments(normalize_maps(heat_s))
    loss, metrics = equivariance_loss(s, tps, mu_s, sigma_s, mu_a, sigma_a)
    # The analytic transport should predict the x-frame moments closely.
    assert float(metrics["equiv_mu"]) < 1e-3, float(metrics["equiv_mu"])
    assert float(metrics["equiv_sigma"]) < 5e-3, float(metrics["equiv_sigma"])


def test_equivariance_grad_finite():
    s = TPSSampler(grid_size=4)
    tps = s.sample(jax.random.key(7), 2)
    mu = jax.random.uniform(jax.random.key(8), (2, 3, 2), minval=-0.5, maxval=0.5)
    sigma = 0.02 * jnp.broadcast_to(jnp.eye(2), (2, 3, 2, 2))

    def f(m):
        return equivariance_loss(s, tps, m, sigma, mu, sigma)[0]

    g = jax.grad(f)(mu)
    assert np.all(np.isfinite(np.asarray(g)))
