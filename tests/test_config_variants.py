"""Coverage for the less-traveled config knobs: heavy-tail rendering,
warped appearance view, spatial pooling, no-background models, and
chex shape validation."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from partseg_tpu.augment import AugmentConfig, make_pair
from partseg_tpu.models.partnet import PartNet, PartNetConfig

BASE = PartNetConfig(n_parts=3, img_size=16, features=16, depth=1,
                     app_features=8, decoder_scales=2, use_pallas=False)


def _forward(cfg, key=0):
    model = PartNet(cfg)
    x = jax.random.uniform(jax.random.key(key), (2, 16, 16, 3))
    params = model.init(jax.random.key(0), x, x)
    return model.apply(params, x, x)


def test_heavy_tail_render_config():
    out = _forward(dataclasses.replace(BASE, render_kernel="heavy_tail"))
    assert np.isfinite(np.asarray(out.recon, np.float32)).all()


def test_no_background_config():
    cfg = dataclasses.replace(BASE, background=False)
    out = _forward(cfg)
    assert out.logits_a.shape[-1] == cfg.n_parts           # no bg channel
    assert out.seg_a.shape[-1] == cfg.n_parts


def test_spatial_pooling_config():
    out = _forward(dataclasses.replace(BASE, pool_masks="spatial"))
    assert np.isfinite(np.asarray(out.appearance)).all()


def test_warp_appearance_view():
    cfg = AugmentConfig(tps_grid=3, warp_appearance_view=True)
    sampler = cfg.make_sampler()
    x = jax.random.uniform(jax.random.key(1), (2, 16, 16, 3))
    pair = make_pair(x, jax.random.key(2), sampler, cfg)
    # The appearance view must now be geometrically changed too.
    assert np.abs(np.asarray(pair["x_a"]) - np.asarray(x)).max() > 1e-3

    # Per-sample key path as well.
    keys = jax.random.split(jax.random.key(3), 2)
    pair2 = make_pair(x, keys, sampler, cfg)
    assert pair2["x_a"].shape == x.shape


def test_chex_rank_validation():
    from partseg_tpu.partops import pool_appearance, soft_argmax_moments

    with pytest.raises(AssertionError):
        soft_argmax_moments(jnp.zeros((4, 4, 2)))          # rank 3, not 4
    with pytest.raises(AssertionError):
        pool_appearance(jnp.zeros((1, 4, 4, 8)), jnp.zeros((1, 8, 8, 2)))


def test_norm_variants_forward_finite():
    # The norm knob ("block"|"group"|"none") must build and run; GN was
    # measured at ~26% of the flagship step, so norm=none is a
    # first-class perf configuration, not an afterthought.
    for norm in ("group", "none"):
        out = _forward(dataclasses.replace(BASE, norm=norm))
        assert np.isfinite(np.asarray(out.recon, np.float32)).all(), norm


def test_decoder_app_proj_off_legacy_path():
    # app_proj=False is the r1 decoder (full appearance channels at
    # every scale) — kept as a knob; both paths must run and agree on
    # output shape.
    from partseg_tpu.models.decoder import Decoder

    mu = jax.random.uniform(jax.random.key(1), (2, 3, 2), minval=-0.5, maxval=0.5)
    sigma = 0.05 * jnp.broadcast_to(jnp.eye(2), (2, 3, 2, 2))
    app = jax.random.normal(jax.random.key(2), (2, 3, 8))
    for app_proj in (True, False):
        dec = Decoder(out_size=16, n_scales=2, features=(16, 8),
                      use_pallas=False, app_proj=app_proj)
        p = dec.init(jax.random.key(0), mu, sigma, app)
        out = dec.apply(p, mu, sigma, app)
        assert out.shape == (2, 16, 16, 3)
        assert np.isfinite(np.asarray(out, np.float32)).all()


def test_speed_config_loads():
    from partseg_tpu.train.config import load_config

    cfg = load_config("configs/speed128.py")
    assert cfg.model.features == 48 and cfg.model.decoder_features == (96, 48, 24)


def test_stem_stride4_config():
    # Bandwidth knob: trunk at img/4. Part maps land at 4², moments and
    # segmentation still well-formed.
    cfg = dataclasses.replace(BASE, stem_stride=4, depth=1)
    out = _forward(cfg)
    assert out.logits_a.shape[1:3] == (4, 4)
    assert out.recon.shape[1:3] == (16, 16)
    assert np.isfinite(np.asarray(out.mu_a)).all()


def test_decoder_out_size_config():
    # Reconstruction decoded straight at the loss resolution; the
    # decoder params stay resolution-agnostic (fully conv).
    cfg = dataclasses.replace(BASE, decoder_out_size=8)
    model = PartNet(cfg)
    x = jax.random.uniform(jax.random.key(5), (2, 16, 16, 3))
    params = model.init(jax.random.key(0), x, x)
    out = model.apply(params, x, x)
    assert out.recon.shape[1:3] == (8, 8)
    # SAME params through a full-res decoder config (inference path).
    full = PartNet(dataclasses.replace(cfg, decoder_out_size=None))
    out_full = full.apply(params, x, x)
    assert out_full.recon.shape[1:3] == (16, 16)


def test_perceptual_handles_smaller_recon():
    from partseg_tpu.losses.perceptual import PerceptualLoss
    from partseg_tpu.losses.vgg import VGG19Features, load_vgg19_npz

    vgg = VGG19Features(extract=("relu1_2",), trim_blocks=1)
    params, _ = load_vgg19_npz(vgg, None, 16)
    loss = PerceptualLoss(params, extract=("relu1_2",), trim_blocks=1,
                          feature_resolution=8)
    x = jax.random.uniform(jax.random.key(6), (2, 16, 16, 3))
    xh = jax.random.uniform(jax.random.key(7), (2, 8, 8, 3))
    v = loss(xh, x)
    assert np.isfinite(float(v))
    # Gradient flows to the small recon.
    g = jax.grad(lambda a: loss(a, x))(xh)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


def test_train_step_with_64core_knobs():
    # The full step with stem_stride=4 + decoder_out_size=8 (the r3
    # bandwidth recipe scaled to test size) runs and is finite.
    from partseg_tpu.train.config import LossConfig, OptimConfig, TrainConfig
    from partseg_tpu.train.loop import build_perceptual
    from partseg_tpu.train.state import create_state
    from partseg_tpu.train.step import make_train_step

    cfg = TrainConfig(
        model=dataclasses.replace(BASE, stem_stride=4, decoder_out_size=8),
        augment=AugmentConfig(tps_grid=3),
        loss=LossConfig(vgg_layers=("relu1_2",), vgg_trim_blocks=1,
                        vgg_resolution=8),
        optim=OptimConfig(warmup_steps=2, decay_steps=10),
        global_batch=4,
    )
    model = PartNet(cfg.model)
    state = create_state(cfg, model, jax.random.key(0))
    step = jax.jit(make_train_step(
        cfg, model, cfg.augment.make_sampler(), build_perceptual(cfg)))
    batch = {"image": jax.random.uniform(jax.random.key(1), (4, 16, 16, 3))}
    new_state, metrics = step(state, batch, jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))


def test_train_period_wf50_d32_composition():
    # The r5 candidate rung at test scale: warp_every=2 period program
    # with warp_fraction=0.5 (sub-batch warp on the warp-on sub-step)
    # composed with decode-at-loss-res (decoder_out_size < img_size,
    # VGG at the recon res). Pins the exact composition
    # tools/quality_study.py gates as speed128_r5_wf50d32.
    from partseg_tpu.train.config import LossConfig, OptimConfig, TrainConfig
    from partseg_tpu.train.loop import build_perceptual
    from partseg_tpu.train.state import create_state
    from partseg_tpu.train.step import make_train_period

    cfg = TrainConfig(
        model=dataclasses.replace(BASE, stem_stride=4, decoder_out_size=8),
        augment=AugmentConfig(tps_grid=3, warp_every=2, warp_fraction=0.5),
        loss=LossConfig(vgg_layers=("relu1_2",), vgg_trim_blocks=1,
                        vgg_resolution=8),
        optim=OptimConfig(warmup_steps=2, decay_steps=10),
        global_batch=4,
    )
    model = PartNet(cfg.model)
    state = create_state(cfg, model, jax.random.key(0))
    period = jax.jit(make_train_period(
        cfg, model, cfg.augment.make_sampler(), build_perceptual(cfg)))
    batches = tuple(
        {"image": jax.random.uniform(jax.random.key(10 + i), (4, 16, 16, 3)),
         "aug_id": jnp.arange(4, dtype=jnp.int32) + 4 * i}
        for i in range(2)
    )
    new_state, metrics = period(state, batches, jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["loss_warp_on"]))
    assert np.isfinite(float(metrics["loss_warp_off"]))
    assert int(new_state.step) == 2
    # Gradients actually moved the params on both sub-steps.
    d = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a, np.float32)
                                  - np.asarray(b, np.float32)).max()),
        state.params, new_state.params)
    assert max(jax.tree.leaves(d)) > 0


def test_head_upsample_config():
    # stem_stride=4 quality fallback: 2x-upsampled logit head restores
    # img/2 part maps while the trunk stays at img/4.
    cfg = dataclasses.replace(BASE, stem_stride=4, depth=1,
                              head_upsample=True)
    out = _forward(cfg)
    assert out.logits_a.shape[1:3] == (8, 8)       # img/2, not img/4
    assert out.appearance.shape[-1] == cfg.app_features
    assert np.isfinite(np.asarray(out.recon, np.float32)).all()
