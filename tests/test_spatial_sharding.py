"""Spatial-sharding exactness tests (docs/spatial_sharding.md,
SURVEY.md §5.7): every building block, run under shard_map with image
ROWS sharded over a "space" mesh axis (8 virtual CPU devices), must
match the unsharded partops implementation bit-for-bit (same op order)
or to f32 tolerance (reductions reassociate across shards)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from partseg_tpu.parallel import (
    halo_exchange,
    sharded_pool_appearance,
    sharded_render_gaussians,
    sharded_soft_argmax_moments,
    sharded_spatial_conv,
    sharded_spatial_softmax,
)
from partseg_tpu.partops import (
    pool_appearance,
    render_gaussians,
    soft_argmax_moments,
    spatial_softmax,
)

B, H, W, K, C = 2, 32, 16, 3, 8
SP = 4          # spatial shards (rows)


def _mesh():
    return Mesh(np.array(jax.devices()[:SP]), ("space",))


def _smap(fn, in_specs, out_specs=P()):
    return jax.jit(
        jax.shard_map(
            fn, mesh=_mesh(), in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    )


ROWS = P(None, "space", None, None)   # [B, H, W, C] rows sharded


def test_halo_exchange_neighbor_rows():
    x = jax.random.normal(jax.random.key(0), (B, H, W, C))

    got = _smap(
        lambda x: halo_exchange(x, 1), (ROWS,), ROWS
    )(x)
    # Each shard's widened slab re-assembles into [B, SP*(Hs+2), W, C];
    # check shard 1's slab == global rows [Hs-1, 2*Hs+1).
    hs = H // SP
    slab = got.reshape(B, SP, hs + 2, W, C)[:, 1]
    np.testing.assert_array_equal(np.asarray(slab), np.asarray(x[:, hs - 1 : 2 * hs + 1]))
    # Global edges are zero rows (SAME-padding semantics).
    top = got.reshape(B, SP, hs + 2, W, C)[:, 0, 0]
    assert np.all(np.asarray(top) == 0.0)


def test_sharded_conv_matches_global_same_conv():
    x = jax.random.normal(jax.random.key(1), (B, H, W, C))
    kern = jax.random.normal(jax.random.key(2), (3, 3, C, 5)) * 0.1

    want = jax.lax.conv_general_dilated(
        x, kern, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = _smap(
        lambda x: sharded_spatial_conv(x, kern), (ROWS,), ROWS
    )(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_sharded_spatial_softmax_matches():
    logits = jax.random.normal(jax.random.key(3), (B, H, W, K)) * 3.0
    want = spatial_softmax(logits)
    got = _smap(sharded_spatial_softmax, (ROWS,), ROWS)(logits)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    # and it really is a global distribution
    s = np.asarray(got).sum(axis=(1, 2))
    np.testing.assert_allclose(s, 1.0, atol=1e-5)


def test_sharded_moments_match():
    logits = jax.random.normal(jax.random.key(4), (B, H, W, K)) * 2.0
    p = spatial_softmax(logits)
    mu_w, sig_w = soft_argmax_moments(p)

    fn = _smap(
        lambda p: sharded_soft_argmax_moments(p, h_global=H),
        (ROWS,), (P(), P()),
    )
    mu_g, sig_g = fn(p)
    np.testing.assert_allclose(np.asarray(mu_g), np.asarray(mu_w), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sig_g), np.asarray(sig_w), atol=1e-5)


def test_sharded_render_matches():
    mu = jax.random.uniform(jax.random.key(5), (B, K, 2), minval=-0.5, maxval=0.5)
    sigma = 0.03 * jnp.broadcast_to(jnp.eye(2), (B, K, 2, 2))
    want = render_gaussians(mu, sigma, H, W)
    fn = _smap(
        lambda m, s: sharded_render_gaussians(
            m, s, h_global=H, w=W, h_local=H // SP
        ),
        (P(), P()),
        P(None, "space", None, None),
    )
    got = fn(mu, sigma)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_sharded_pooling_matches():
    feats = jax.random.normal(jax.random.key(6), (B, H, W, C))
    parts = jax.nn.softmax(
        jax.random.normal(jax.random.key(7), (B, H, W, K)), axis=-1
    )
    want = pool_appearance(feats, parts)
    got = _smap(sharded_pool_appearance, (ROWS, ROWS), P())(feats, parts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_end_to_end_shape_head_sharded():
    # conv → spatial softmax → moments → render, all row-sharded, vs
    # the same chain unsharded: the full part-discovery head works
    # spatially sharded (the >128px scaling path).
    x = jax.random.normal(jax.random.key(8), (B, H, W, C))
    kern = jax.random.normal(jax.random.key(9), (3, 3, C, K)) * 0.2

    def head_unsharded(x):
        logits = jax.lax.conv_general_dilated(
            x, kern, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        p = spatial_softmax(logits)
        mu, sig = soft_argmax_moments(p)
        return render_gaussians(mu, sig, H, W)

    def head_sharded(x):
        logits = sharded_spatial_conv(x, kern)
        p = sharded_spatial_softmax(logits)
        mu, sig = sharded_soft_argmax_moments(p, h_global=H)
        return sharded_render_gaussians(mu, sig, H, W, h_local=H // SP)

    want = head_unsharded(x)
    got = _smap(head_sharded, (ROWS,), ROWS)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_sharded_shape_encoder_matches_flax_forward():
    # The FULL trained shape encoder forward, row-sharded over 4
    # devices (halo convs + global-stat GroupNorms + local pools), must
    # match the single-device Flax forward — the >128px inference path
    # (parallel/spatial_model.py) with unchanged checkpoints.
    from partseg_tpu.models.encoders import ShapeEncoder
    from partseg_tpu.parallel.spatial_model import sharded_shape_encoder

    depth = 2
    enc = ShapeEncoder(n_parts=3, background=True, depth=depth,
                       features=16, n_stacks=1, dtype=jnp.float32)
    x = jax.random.uniform(jax.random.key(10), (2, 64, 32, 3))
    params = enc.init(jax.random.key(11), x)
    want = enc.apply(params, x)

    fn = _smap(
        lambda xs: sharded_shape_encoder(params, xs, depth=depth),
        (ROWS,), ROWS,
    )
    got = fn(x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


@functools.lru_cache(None)
def _norm_mode_case_np(norm):
    # CLAUDE.md: never lru_cache jnp arrays — cache NUMPY (host) copies
    # and rehydrate per call.
    from partseg_tpu.models.encoders import ShapeEncoder

    enc = ShapeEncoder(n_parts=3, background=True, depth=2, features=16,
                       n_stacks=1, norm=norm, dtype=jnp.float32)
    x = jax.random.uniform(jax.random.key(20), (2, 64, 32, 3))
    params = enc.init(jax.random.key(21), x)
    return enc, np.asarray(x), jax.device_get(params)


def _norm_mode_case(norm):
    enc, x, params = _norm_mode_case_np(norm)
    return enc, jnp.asarray(x), params


def test_sharded_shape_encoder_all_norm_modes():
    # VERDICT r2 weak #3: checkpoints trained with EVERY shipped norm
    # knob (partnet.py) must run exactly through the sharded forward.
    from partseg_tpu.parallel.spatial_model import sharded_shape_encoder

    for norm in ("block", "group", "none"):
        enc, x, params = _norm_mode_case(norm)
        want = enc.apply(params, x)
        fn = _smap(
            lambda xs, params=params, norm=norm: sharded_shape_encoder(
                params, xs, depth=2, norm=norm
            ),
            (ROWS,), ROWS,
        )
        got = fn(x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4,
            err_msg=f"norm={norm}",
        )


def test_sharded_shape_encoder_rejects_mismatched_norm_mode():
    # A wrong norm flag must fail LOUDLY (capability check), not with a
    # bare KeyError deep in the param tree.
    import pytest

    from partseg_tpu.parallel.spatial_model import sharded_shape_encoder

    _, x, params = _norm_mode_case("group")
    fn = _smap(
        lambda xs: sharded_shape_encoder(params, xs, depth=2, norm="block"),
        (ROWS,), ROWS,
    )
    with pytest.raises(ValueError, match="does not match norm"):
        fn(x)


def test_spatial_train_step_matches_unsharded():
    # VERDICT r2 item #4: the FULL train step — augmentation, both
    # encoders, decoder, perceptual+equiv+seg losses, gradients — under
    # a ("data", "space") mesh must match the unsharded step: loss and
    # every gradient leaf.
    from jax.sharding import NamedSharding

    from partseg_tpu.augment.pair import AugmentConfig
    from partseg_tpu.models.partnet import PartNet, PartNetConfig
    from partseg_tpu.parallel.spatial_train import build_spatial_step_fn
    from partseg_tpu.train.config import LossConfig, OptimConfig, TrainConfig
    from partseg_tpu.train.loop import build_perceptual
    from partseg_tpu.train.state import create_state
    from partseg_tpu.train.step import make_train_step

    cfg = TrainConfig(
        model=PartNetConfig(n_parts=3, img_size=32, features=16, depth=1,
                            app_features=8, decoder_scales=2,
                            decoder_features=(16, 8), use_pallas=False,
                            dtype=jnp.float32),
        augment=AugmentConfig(tps_grid=3, warp_impl="gather"),
        loss=LossConfig(vgg_layers=("relu1_2",), vgg_trim_blocks=1),
        optim=OptimConfig(warmup_steps=2, decay_steps=10),
        global_batch=4,
    )
    model = PartNet(cfg.model)
    sampler = cfg.augment.make_sampler()
    perceptual = build_perceptual(cfg)
    state = create_state(cfg, model, jax.random.key(0))

    imgs = jax.random.uniform(jax.random.key(1), (4, 32, 32, 3))
    aug_id = jnp.arange(4, dtype=jnp.int32)

    # Unsharded reference.
    ref_step = jax.jit(make_train_step(cfg, model, sampler, perceptual))
    ref_state, ref_metrics = ref_step(
        state, {"image": imgs, "aug_id": aug_id}, jax.random.key(7)
    )

    # (2 data × 2 space) mesh.
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "space"))
    step = build_spatial_step_fn(cfg, sampler, perceptual, mesh)
    sh = NamedSharding(mesh, P("data", "space"))
    batch = {
        "image": jax.device_put(imgs, sh),
        "aug_id": jax.device_put(aug_id, NamedSharding(mesh, P("data"))),
    }
    got_state, got_metrics = step(
        jax.device_put(state, NamedSharding(mesh, P())), batch,
        jax.random.key(7),
    )

    np.testing.assert_allclose(
        float(got_metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-5
    )
    ref_params = jax.tree.leaves(ref_state.params)
    got_params = jax.tree.leaves(jax.device_get(got_state.params))
    for a, b in zip(got_params, ref_params):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5,
            err_msg="param mismatch after one update",
        )


def test_spatial_train_step_swap_loss_matches_dp():
    # The appearance-swap round (decode rolled appearance → re-encode →
    # moments) rolls per-DATA-shard, exactly like the shard_map DP
    # branch — so (2 data × 2 space) must match DP-over-2-devices
    # bit-for-bit on loss and the swap metric.
    from jax.sharding import NamedSharding

    from partseg_tpu.augment.pair import AugmentConfig
    from partseg_tpu.models.partnet import PartNet, PartNetConfig
    from partseg_tpu.parallel.spatial_train import build_spatial_step_fn
    from partseg_tpu.train.config import LossConfig, OptimConfig, TrainConfig
    from partseg_tpu.train.loop import build_perceptual, build_step_fn
    from partseg_tpu.train.state import create_state

    cfg = TrainConfig(
        model=PartNetConfig(n_parts=3, img_size=32, features=16, depth=1,
                            app_features=8, decoder_scales=2,
                            decoder_features=(16, 8), use_pallas=False,
                            dtype=jnp.float32),
        augment=AugmentConfig(tps_grid=3, warp_impl="gather"),
        loss=LossConfig(vgg_layers=("relu1_2",), vgg_trim_blocks=1,
                        swap_weight=0.5),
        optim=OptimConfig(warmup_steps=2, decay_steps=10),
        global_batch=4,
    )
    model = PartNet(cfg.model)
    sampler = cfg.augment.make_sampler()
    perceptual = build_perceptual(cfg)
    state = create_state(cfg, model, jax.random.key(0))
    imgs = jax.random.uniform(jax.random.key(1), (4, 32, 32, 3))
    aug_id = jnp.arange(4, dtype=jnp.int32)

    dp_mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    dp_step = build_step_fn(cfg, model, sampler, perceptual, dp_mesh)
    dp_batch = {
        "image": jax.device_put(imgs, NamedSharding(dp_mesh, P("data"))),
        "aug_id": jax.device_put(aug_id, NamedSharding(dp_mesh, P("data"))),
    }
    _, ref = dp_step(
        jax.device_put(state, NamedSharding(dp_mesh, P())), dp_batch,
        jax.random.key(7),
    )

    sp_mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                   ("data", "space"))
    sp_step = build_spatial_step_fn(cfg, sampler, perceptual, sp_mesh)
    # Both step fns donate their state argument — rebuild it.
    state = create_state(cfg, model, jax.random.key(0))
    sp_batch = {
        "image": jax.device_put(
            imgs, NamedSharding(sp_mesh, P("data", "space"))
        ),
        "aug_id": jax.device_put(aug_id, NamedSharding(sp_mesh, P("data"))),
    }
    _, got = sp_step(
        jax.device_put(state, NamedSharding(sp_mesh, P())), sp_batch,
        jax.random.key(7),
    )
    np.testing.assert_allclose(
        float(got["swap"]), float(ref["swap"]), rtol=2e-5
    )
    np.testing.assert_allclose(
        float(got["loss"]), float(ref["loss"]), rtol=2e-5
    )


def test_sharded_shape_encoder_stem_stride4():
    # r3 throughput checkpoints train with stem_stride=4; the sharded
    # forward must honor the stride and stay exact.
    from partseg_tpu.models.encoders import ShapeEncoder
    from partseg_tpu.parallel.spatial_model import sharded_shape_encoder

    enc = ShapeEncoder(n_parts=3, background=True, depth=1, features=16,
                       n_stacks=1, stem_stride=4, dtype=jnp.float32)
    x = jax.random.uniform(jax.random.key(30), (2, 64, 32, 3))
    params = enc.init(jax.random.key(31), x)
    want = enc.apply(params, x)
    fn = _smap(
        lambda xs: sharded_shape_encoder(
            params, xs, depth=1, stem_stride=4
        ),
        (ROWS,), ROWS,
    )
    got = fn(x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_sharded_encoders_head_upsample():
    # head_upsample=True checkpoints (the stem_stride=4 quality
    # fallback) must run exactly through BOTH sharded encoders — the 2x
    # NN upsample is row-local, so row shards stay exact. Before this
    # was implemented the sharded forward silently computed the
    # head at the coarse grid (wrong values, right param tree).
    from partseg_tpu.models.encoders import AppearanceEncoder, ShapeEncoder
    from partseg_tpu.parallel.spatial_model import (
        sharded_appearance_encoder,
        sharded_shape_encoder,
    )

    x = jax.random.uniform(jax.random.key(40), (2, 64, 32, 3))

    enc = ShapeEncoder(n_parts=3, background=True, depth=1, features=16,
                       n_stacks=1, stem_stride=4, head_upsample=True,
                       dtype=jnp.float32)
    params = enc.init(jax.random.key(41), x)
    want = enc.apply(params, x)
    got = _smap(
        lambda xs: sharded_shape_encoder(
            params, xs, depth=1, stem_stride=4, head_upsample=True
        ),
        (ROWS,), ROWS,
    )(x)
    assert got.shape == want.shape        # 2x the coarse grid
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    app = AppearanceEncoder(out_features=8, depth=1, features=16,
                            stem_stride=4, head_upsample=True,
                            dtype=jnp.float32)
    aparams = app.init(jax.random.key(42), x)
    awant = app.apply(aparams, x)
    agot = _smap(
        lambda xs: sharded_appearance_encoder(
            aparams, xs, depth=1, stem_stride=4, head_upsample=True
        ),
        (ROWS,), ROWS,
    )(x)
    assert agot.shape == awant.shape
    np.testing.assert_allclose(np.asarray(agot), np.asarray(awant), atol=2e-4)


def test_spatial_forward_rejects_act_quant():
    # Activation-storage quantization is not implemented in the sharded
    # reimplementation; it must refuse loudly (same contract as the
    # norm-mode capability check).
    import pytest

    from partseg_tpu.models.partnet import PartNetConfig
    from partseg_tpu.parallel.spatial_train import sharded_partnet_forward

    cfg = PartNetConfig(n_parts=3, img_size=32, features=16, depth=1,
                        act_quant="f8")
    with pytest.raises(ValueError, match="act_quant"):
        sharded_partnet_forward({}, None, None, cfg)
