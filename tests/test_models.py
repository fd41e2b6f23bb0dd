"""Shape/appearance encoder, decoder, and PartNet forward tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from partseg_tpu.models import (
    AppearanceEncoder,
    Decoder,
    Hourglass,
    PartNet,
    PartNetConfig,
    ShapeEncoder,
)

CFG = PartNetConfig(n_parts=4, img_size=32, features=32, depth=2,
                    app_features=16, decoder_scales=3, use_pallas=False)


def test_hourglass_preserves_shape():
    m = Hourglass(depth=3, features=16)
    x = jnp.zeros((1, 16, 16, 16))
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == x.shape


def test_shape_encoder_output_shape():
    m = ShapeEncoder(n_parts=4, background=True, depth=2, features=32)
    x = jnp.zeros((2, 32, 32, 3))
    y = m.apply(m.init(jax.random.key(0), x), x)
    assert y.shape == (2, 16, 16, 5)
    assert y.dtype == jnp.float32  # logit head stays f32


def test_appearance_encoder_output_shape():
    m = AppearanceEncoder(out_features=16, depth=2, features=32)
    x = jnp.zeros((2, 32, 32, 3))
    y = m.apply(m.init(jax.random.key(0), x), x)
    assert y.shape == (2, 16, 16, 16)


def test_decoder_output_range_and_shape():
    m = Decoder(out_size=32, n_scales=3, features=32)
    mu = jnp.zeros((2, 4, 2))
    sigma = 0.05 * jnp.broadcast_to(jnp.eye(2), (2, 4, 2, 2))
    app = jax.random.normal(jax.random.key(1), (2, 4, 16))
    y = m.apply(m.init(jax.random.key(0), mu, sigma, app), mu, sigma, app)
    assert y.shape == (2, 32, 32, 3)
    yn = np.asarray(y)
    assert yn.min() >= 0.0 and yn.max() <= 1.0


@pytest.fixture(scope="module")
def partnet_and_params():
    model = PartNet(CFG)
    x = jnp.zeros((2, 32, 32, 3))
    params = model.init(jax.random.key(0), x, x)
    return model, params


def test_partnet_full_forward(partnet_and_params):
    model, params = partnet_and_params
    key = jax.random.key(1)
    x_s = jax.random.uniform(key, (2, 32, 32, 3))
    x_a = jax.random.uniform(jax.random.key(2), (2, 32, 32, 3))
    out = model.apply(params, x_s, x_a)
    assert out.recon.shape == (2, 32, 32, 3)
    assert out.mu_a.shape == (2, 4, 2)
    assert out.sigma_a.shape == (2, 4, 2, 2)
    assert out.appearance.shape == (2, 4, 16)
    assert out.seg_a.shape == (2, 16, 16, 5)
    np.testing.assert_allclose(
        np.asarray(out.parts_a.sum(axis=(1, 2))), 1.0, rtol=1e-4
    )
    np.testing.assert_allclose(np.asarray(out.seg_a.sum(axis=-1)), 1.0, rtol=1e-4)
    # mu in [-1, 1]
    assert np.abs(np.asarray(out.mu_a)).max() <= 1.0


def test_partnet_grad_finite(partnet_and_params):
    model, params = partnet_and_params
    x = jax.random.uniform(jax.random.key(3), (1, 32, 32, 3))

    def loss(p):
        out = model.apply(p, x, x)
        return jnp.mean((out.recon - x.astype(out.recon.dtype)) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l, dtype=np.float32))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_partnet_inference_path(partnet_and_params):
    # SURVEY.md §3.2: shape-encoder-only inference (no decoder).
    model, params = partnet_and_params
    x = jax.random.uniform(jax.random.key(4), (1, 32, 32, 3))
    logits = model.apply(params, x, method=PartNet.encode_shape)
    parts, mu, sigma = model.apply(params, logits, method=PartNet.shape_stats)
    seg = model.apply(params, logits, method=PartNet.segmentation)
    assert logits.shape == (1, 16, 16, 5)
    assert parts.shape == (1, 16, 16, 4)
    assert mu.shape == (1, 4, 2) and sigma.shape == (1, 4, 2, 2)
    assert seg.shape == (1, 16, 16, 5)


def test_partnet_pallas_path_matches_reference():
    # The fused-kernel model path must match the pure-jnp path.
    import dataclasses

    cfg_ref = PartNetConfig(n_parts=3, img_size=16, features=16, depth=1,
                            app_features=8, decoder_scales=2, use_pallas=False)
    cfg_pal = dataclasses.replace(cfg_ref, use_pallas=True)
    x = jax.random.uniform(jax.random.key(8), (2, 16, 16, 3))
    params = PartNet(cfg_ref).init(jax.random.key(0), x, x)
    out_ref = PartNet(cfg_ref).apply(params, x, x)
    out_pal = PartNet(cfg_pal).apply(params, x, x)
    np.testing.assert_allclose(
        np.asarray(out_pal.mu_a), np.asarray(out_ref.mu_a), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_pal.recon, np.float32),
        np.asarray(out_ref.recon, np.float32),
        atol=2e-2,  # bf16 conv stack downstream of f32-vs-bf16 assembly
    )


def test_partnet_divide_normalization_knob():
    cfg = PartNetConfig(n_parts=3, img_size=16, features=16, depth=1,
                        app_features=8, decoder_scales=2, spatial_norm="divide")
    model = PartNet(cfg)
    x = jax.random.uniform(jax.random.key(5), (1, 16, 16, 3))
    params = model.init(jax.random.key(0), x, x)
    out = model.apply(params, x, x)
    np.testing.assert_allclose(
        np.asarray(out.parts_a.sum(axis=(1, 2))), 1.0, rtol=1e-4
    )


def test_f8_store_values_and_straight_through_grad():
    # blocks.f8_store: value = a genuine float8_e4m3 roundtrip; grad =
    # identity (WITHOUT the custom VJP the convert transpose would
    # quantize the cotangent through f8 too).
    from partseg_tpu.models.blocks import f8_store, quantize_activation

    x = jnp.array([0.1, 1.7, -3.3, 400.0], jnp.bfloat16)
    y = f8_store(x)
    assert y.dtype == x.dtype
    np.testing.assert_array_equal(
        np.asarray(x.astype(jnp.float8_e4m3fn).astype(jnp.bfloat16)),
        np.asarray(y),
    )
    g = jax.grad(lambda v: f8_store(v).astype(jnp.float32).sum())(x)
    np.testing.assert_array_equal(np.asarray(g, np.float32), 1.0)
    # knob plumbing
    assert quantize_activation(x, "none") is x
    with pytest.raises(ValueError, match="act_quant"):
        quantize_activation(x, "int4")


def test_partnet_act_quant_f8_forward_and_grad():
    # The act_quant="f8" model (the r4 bandwidth probe) must train:
    # finite forward, finite nonzero grads, and outputs CLOSE to the
    # unquantized model at init (same params — act_quant adds none).
    import dataclasses

    cfg8 = dataclasses.replace(CFG, act_quant="f8")
    model8, model = PartNet(cfg8), PartNet(CFG)
    x = jax.random.uniform(jax.random.key(7), (2, 32, 32, 3))
    params = model.init(jax.random.key(0), x, x)   # identical param tree
    out8 = model8.apply(params, x, x)
    out = model.apply(params, x, x)
    assert np.all(np.isfinite(np.asarray(out8.recon, np.float32)))
    # f8 e4m3 keeps ~2 decimal digits; the part distributions must stay
    # functionally unchanged at init.
    np.testing.assert_allclose(
        np.asarray(out8.mu_a), np.asarray(out.mu_a), atol=0.1
    )

    def loss(p):
        o = model8.apply(p, x, x)
        return jnp.mean((o.recon - x.astype(o.recon.dtype)) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l, np.float32))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
