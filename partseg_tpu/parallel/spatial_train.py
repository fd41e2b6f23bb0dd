"""Spatially-sharded FULL train step — the >128px training path.

VERDICT r2 missing #4 / SURVEY.md §5.7: turns the exact sharded
building blocks (parallel/spatial.py, parallel/spatial_model.py) into a
CONSUMER: the complete PartNet train step — paired augmentation, both
encoders, decoder, perceptual + equivariance + segmentation losses, and
gradients — under a 2-D ("data", "space") mesh with image ROWS sharded
over "space" and the batch over "data". Params stay replicated; Orbax
checkpoints are unchanged.

Design:
  - Augmentation is an IMAGE-level op (the TPS warp gathers arbitrary
    rows), so each space shard all-gathers its data-shard's input rows
    (a [B_loc, H, W, 3] tensor — tiny next to the activations spatial
    sharding exists to split), augments the full image with the same
    per-sample keys (identical draws on every shard), and keeps its own
    rows. Compute is duplicated across the space axis; bytes are not.
  - Forward: sharded encoders (halo convs + psum GroupNorm), pixel-local
    part softmax, psum moments/pooling, row-local rendering, sharded
    decoder and VGG. Every cross-row reduction is an explicit psum, so
    each shard holds the EXACT global loss for its data shard.
  - Gradients: jax.grad of the per-shard loss. psum's shard_map
    transpose delivers each shard's own-row contribution, so the true
    gradient is psum over "space", then pmean over "data" — asserted
    exact (loss AND grads) vs the unsharded step in
    tests/test_spatial_sharding.py.

All of train/step.py's loss terms are supported, including the
appearance-swap round (decode with rolled appearance → re-encode →
moments, all sharded; the roll is per-data-shard exactly like the
shard_map DP branch).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from partseg_tpu.augment.pair import make_pair
from partseg_tpu.losses.equivariance import equivariance_loss
from partseg_tpu.parallel.spatial import (
    SPACE_AXIS,
    sharded_pool_appearance,
    sharded_render_gaussians,
    sharded_soft_argmax_moments,
    sharded_spatial_softmax,
)
from partseg_tpu.parallel.spatial_model import (
    _conv,
    _resblock,
    _upsample2,
    sharded_appearance_encoder,
    sharded_shape_encoder,
    sharded_group_norm,
)
from partseg_tpu.partops.assembly import assemble_decoder_input
from partseg_tpu.partops.moments import precision_from_cov
from partseg_tpu.train.state import TrainState, make_optimizer

DATA_AXIS = "data"


def _pmean_elems(x: jax.Array, axis_name: str) -> jax.Array:
    """Mean over ALL elements of a row-sharded tensor (exact: local sum,
    psum, divide by the global element count)."""
    n = jax.lax.axis_size(axis_name)
    s = jax.lax.psum(jnp.sum(x), axis_name)
    return s / (x.size * n)


# ------------------------------------------------------------------ decoder


def sharded_decoder(
    params, mu, sigma, appearance, cfg, axis_name: str = SPACE_AXIS
):
    """models/decoder.py forward on row shards: (μ, Σ, a) are
    replicated; rendering and convs are row-parallel with halo/psum."""
    p = params["params"] if "params" in params else params
    out_size = cfg.decoder_out_size or cfg.img_size
    n_scales = cfg.decoder_scales
    feats = cfg.decoder_features
    n_sp = jax.lax.axis_size(axis_name)

    lam = precision_from_cov(sigma)
    app = appearance.astype(cfg.dtype)
    rb = [0]  # flax auto-numbering of the decoder's ResBlocks

    def resblock(x):
        block = p[f"ResBlock_{rb[0]}"]
        rb[0] += 1
        return _resblock(x, block, axis_name, cfg.norm)

    x = None
    for i in range(n_scales):
        res = out_size // (2 ** (n_scales - 1 - i))
        f = feats[min(i, len(feats) - 1)] if not isinstance(feats, int) else feats
        d = p[f"app_proj_{i}"]
        a_i = (app @ d["kernel"].astype(app.dtype)) + d["bias"].astype(app.dtype)
        blobs = sharded_render_gaussians(
            mu, sigma, res, res, h_local=res // n_sp,
            kernel=cfg.render_kernel, precision=lam, dtype=cfg.dtype,
            axis_name=axis_name,
        )
        feat = assemble_decoder_input(blobs, a_i)
        x = feat if x is None else jnp.concatenate([_upsample2(x), feat], axis=-1)
        x = resblock(x)
        x = resblock(x)
    rgb = _conv(x.astype(jnp.float32), p["Conv_0"], axis_name)
    return jax.nn.sigmoid(rgb)


# ------------------------------------------------------------------ vgg loss


def sharded_vgg_features(
    params, x, extract, trim_blocks, dtype, axis_name: str = SPACE_AXIS
):
    """losses/vgg.py VGG19Features forward on row shards (halo convs,
    row-local 2×2 maxpool — h_local must stay even through the pools)."""
    from partseg_tpu.losses.vgg import _MEAN, _STD, _VGG19_BLOCKS

    p = params["params"] if "params" in params else params
    h = (x - jnp.asarray(_MEAN, x.dtype)) / jnp.asarray(_STD, x.dtype)
    h = h.astype(dtype)
    wanted = set(extract)
    deepest = max(
        (b, i)
        for b, n, _ in _VGG19_BLOCKS
        for i in range(1, n + 1)
        if f"relu{b}_{i}" in wanted
    )
    feats = {}
    for block, n_convs, _ch in _VGG19_BLOCKS[:trim_blocks]:
        for i in range(1, n_convs + 1):
            h = jax.nn.relu(_conv(h, p[f"conv{block}_{i}"], axis_name))
            name = f"relu{block}_{i}"
            if name in wanted:
                feats[name] = h
            if (block, i) == deepest:
                return feats
        b_, hh, ww, cc = h.shape
        h = h.reshape(b_, hh // 2, 2, ww // 2, 2, cc).max(axis=(2, 4))
    return feats


def sharded_perceptual_loss(perceptual, x_hat, x, axis_name: str = SPACE_AXIS):
    """losses/perceptual.py semantics with row-sharded inputs: pool to
    the feature resolution row-locally, sharded VGG on both, element
    means via psum."""
    from partseg_tpu.losses.perceptual import _pool_mean

    n_sp = jax.lax.axis_size(axis_name)
    h_hat_g = x_hat.shape[1] * n_sp                 # global resolutions
    h_g = x.shape[1] * n_sp
    vh, vt = x_hat, x.astype(x_hat.dtype)
    r = perceptual.feature_resolution or h_hat_g
    r = min(r, h_hat_g)
    mdt = perceptual.model.dtype
    if h_hat_g > r:
        vh = _pool_mean(vh.astype(mdt), h_hat_g // r)
    if h_g > r:
        vt = _pool_mean(vt.astype(mdt), h_g // r)
    fh = sharded_vgg_features(
        perceptual.params, vh, perceptual.extract,
        perceptual.model.trim_blocks, mdt, axis_name,
    )
    ft = jax.lax.stop_gradient(
        sharded_vgg_features(
            perceptual.params, vt, perceptual.extract,
            perceptual.model.trim_blocks, mdt, axis_name,
        )
    )
    loss = jnp.float32(0.0)
    for name, w in zip(perceptual.extract, perceptual.layer_weights):
        loss = loss + w * _pmean_elems(
            jnp.abs(fh[name] - ft[name]).astype(jnp.float32), axis_name
        )
    if perceptual.pixel_weight:
        xp = x
        if h_g > h_hat_g:
            xp = _pool_mean(x.astype(jnp.float32), h_g // h_hat_g)
        loss = loss + perceptual.pixel_weight * _pmean_elems(
            jnp.abs(x_hat.astype(jnp.float32) - xp.astype(jnp.float32)),
            axis_name,
        )
    return loss


# ------------------------------------------------------------------ forward


def _sharded_stats(logits, cfg, h_map_g, axis_name):
    """PartNet.shape_stats on row shards (partnet.py:115-132): spatial
    normalization over the GLOBAL map + psum moments."""
    fg = logits[..., : cfg.n_parts]
    if cfg.spatial_norm == "softmax":
        parts = sharded_spatial_softmax(fg, axis_name)
    else:
        e = jax.nn.softplus(fg.astype(jnp.float32))
        s = jax.lax.psum(jnp.sum(e, axis=(1, 2), keepdims=True), axis_name)
        parts = e / (s + 1e-8)
    mu, sigma = sharded_soft_argmax_moments(
        parts, h_global=h_map_g, axis_name=axis_name
    )
    return parts, mu, sigma


def sharded_partnet_forward(params, x_s, x_a, cfg, axis_name: str = SPACE_AXIS):
    """PartNet.__call__ (models/partnet.py) on row shards. Returns the
    output fields the losses consume (all μ/Σ/appearance replicated;
    image-like fields row-sharded)."""
    if getattr(cfg, "act_quant", "none") != "none":
        raise ValueError(
            "spatial sharding does not implement activation-storage "
            f"quantization (act_quant={cfg.act_quant!r}); train spatial "
            "configs with act_quant='none' — a silent numeric mismatch "
            "vs the Flax forward is worse than this error"
        )
    p = params["params"] if "params" in params else params
    b = x_s.shape[0]
    h_map_g = cfg.map_size                 # includes head_upsample's 2x

    logits_both = sharded_shape_encoder(
        p["shape_enc"], jnp.concatenate([x_a, x_s], axis=0),
        depth=cfg.depth, n_stacks=cfg.n_stacks, norm=cfg.norm,
        stem_stride=cfg.stem_stride, head_upsample=cfg.head_upsample,
        axis_name=axis_name,
    )
    logits_a, logits_s = logits_both[:b], logits_both[b:]
    k = cfg.n_parts

    parts_a, mu_a, sigma_a = _sharded_stats(logits_a, cfg, h_map_g, axis_name)
    parts_s, mu_s, sigma_s = _sharded_stats(logits_s, cfg, h_map_g, axis_name)

    feats_s = sharded_appearance_encoder(
        p["app_enc"], x_s, depth=cfg.depth, norm=cfg.norm,
        stem_stride=cfg.stem_stride, head_upsample=cfg.head_upsample,
        axis_name=axis_name,
    )
    seg = jax.nn.softmax(logits_s.astype(jnp.float32), axis=-1)
    masks_s = seg[..., :k] if cfg.pool_masks == "pixel" else parts_s
    appearance = sharded_pool_appearance(feats_s, masks_s, axis_name=axis_name)

    recon = sharded_decoder(
        p["decoder"], mu_a, sigma_a, appearance, cfg, axis_name
    )
    return dict(
        recon=recon, logits_a=logits_a, mu_a=mu_a, sigma_a=sigma_a,
        mu_s=mu_s, sigma_s=sigma_s, appearance=appearance,
    )


# ------------------------------------------------------------------ train step


def make_spatial_train_step(
    cfg, sampler, perceptual,
    data_axis: str = DATA_AXIS, space_axis: str = SPACE_AXIS,
    warp_on: bool = True,
) -> Callable[[TrainState, dict, jax.Array], tuple[TrainState, dict]]:
    """The shard_map BODY of the full spatially-sharded train step
    (train/step.py semantics under a ("data", "space") mesh). Jit it
    via build_spatial_step_fn. warp_on: STATIC, see
    train/step.make_train_step (warp_every schedules compile an
    on-graph and an off-graph)."""
    optimizer = make_optimizer(cfg.optim)
    lw = cfg.loss
    mc = cfg.model

    def loss_fn(params, batch, key):
        rows = batch["image"]                       # [B_loc, H_loc, W, 3]
        if rows.dtype == jnp.uint8:
            rows = rows.astype(jnp.float32) * (1.0 / 255.0)
        # Re-assemble the full image per data shard: augmentation warps
        # across rows. all_gather over "space" is tiled [n_sp, B, h, w, 3].
        tiles = jax.lax.all_gather(rows, space_axis)
        n_sp = tiles.shape[0]
        images = jnp.concatenate([tiles[i] for i in range(n_sp)], axis=1)
        key = jax.vmap(lambda i: jax.random.fold_in(key, i))(batch["aug_id"])
        pair = jax.lax.stop_gradient(
            make_pair(images.astype(mc.dtype), key, sampler, cfg.augment,
                      warp_on=warp_on)
        )
        h_loc = rows.shape[1]
        r0 = jax.lax.axis_index(space_axis) * h_loc
        xs = jax.lax.dynamic_slice_in_dim(pair["x_s"], r0, h_loc, axis=1)
        xa = jax.lax.dynamic_slice_in_dim(pair["x_a"], r0, h_loc, axis=1)
        x_rows = jax.lax.dynamic_slice_in_dim(images, r0, h_loc, axis=1)

        out = sharded_partnet_forward(params, xs, xa, mc, space_axis)
        l_rec = sharded_perceptual_loss(perceptual, out["recon"], x_rows,
                                        space_axis)
        l_eq, eq_metrics = equivariance_loss(
            sampler, pair["tps"], out["mu_s"], out["sigma_s"],
            out["mu_a"], out["sigma_a"], sigma_weight=lw.equiv_sigma_weight,
        )
        loss = lw.rec_weight * l_rec + lw.equiv_weight * l_eq
        metrics = {"rec": l_rec, "equiv": l_eq, **eq_metrics}
        if lw.seg_weight and mc.background:
            l_seg = _sharded_seg_consistency(mc, out, space_axis)
            loss = loss + lw.seg_weight * l_seg
            metrics["seg"] = l_seg
        if lw.swap_weight:
            # Appearance-swap consistency (step.py:92-107): the roll is
            # per-DATA-shard, exactly like the shard_map DP branch.
            p = params["params"] if "params" in params else params
            app_sw = jnp.roll(out["appearance"], 1, axis=0)
            recon_sw = sharded_decoder(
                p["decoder"], out["mu_a"], out["sigma_a"], app_sw, mc,
                space_axis,
            )
            logits_sw = sharded_shape_encoder(
                p["shape_enc"], recon_sw.astype(mc.dtype), depth=mc.depth,
                n_stacks=mc.n_stacks, norm=mc.norm,
                stem_stride=mc.stem_stride, head_upsample=mc.head_upsample,
                axis_name=space_axis,
            )
            out_size = mc.decoder_out_size or mc.img_size
            h_sw = (out_size // mc.stem_stride) * (2 if mc.head_upsample else 1)
            _, mu_sw, _ = _sharded_stats(logits_sw, mc, h_sw, space_axis)
            l_swap = jnp.mean(
                jnp.sum(
                    (mu_sw - out["mu_a"].astype(jnp.float32)) ** 2, axis=-1
                )
            )
            loss = loss + lw.swap_weight * l_swap
            metrics["swap"] = l_swap
        metrics["loss"] = loss
        return loss, metrics

    def train_step(state: TrainState, batch: dict, key: jax.Array):
        key = jax.random.fold_in(key, state.step)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key
        )
        # Each space shard's grad is its own-row contribution (psum's
        # shard_map transpose); sum over "space", average over "data".
        grads = jax.lax.psum(grads, space_axis)
        grads = jax.lax.pmean(grads, data_axis)
        metrics = jax.lax.pmean(metrics, data_axis)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return state.replace(
            step=state.step + 1, params=params, opt_state=opt_state
        ), metrics

    return train_step


def _sharded_seg_consistency(mc, out, axis_name):
    """train/step.py _seg_consistency on row shards (render row-local,
    mean via psum)."""
    logits = out["logits_a"]
    b, h_loc, w, _ = logits.shape
    n_sp = jax.lax.axis_size(axis_name)
    lam = precision_from_cov(out["sigma_a"])
    phi = sharded_render_gaussians(
        out["mu_a"], out["sigma_a"], h_loc * n_sp, w, h_local=h_loc,
        precision=lam, axis_name=axis_name,
    )
    bg = jnp.clip(1.0 - jnp.sum(phi, axis=-1, keepdims=True), 0.0, 1.0)
    target = jnp.concatenate([phi, bg], axis=-1)
    target = jax.lax.stop_gradient(
        target / (jnp.sum(target, axis=-1, keepdims=True) + 1e-8)
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.sum(target * logp, axis=-1)           # [B, h_loc, w]
    return _pmean_elems(ce, axis_name)


def build_spatial_step_fn(cfg, sampler, perceptual, mesh, warp_on: bool = True):
    """Jit the spatial train step over a 2-D ("data", "space") Mesh.

    batch["image"] must be sharded P("data", "space") (rows over
    "space"); batch["aug_id"] P("data"); params/state replicated."""
    from jax.sharding import PartitionSpec as P

    body = make_spatial_train_step(cfg, sampler, perceptual, warp_on=warp_on)
    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), {"image": P("data", "space"), "aug_id": P("data")}, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=0)
