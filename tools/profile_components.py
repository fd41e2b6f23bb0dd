"""Component-level timing on the real chip: find the train-step bottleneck.

Times fwd(+bwd) of each stage in isolation at the flagship 128px config
(batch 64) and prints a table. Keeps compile units small so iteration
is fast (the monolithic step takes ~25 min to compile on axon).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from partseg_tpu.augment.pair import AugmentConfig, make_pair
from partseg_tpu.losses.perceptual import PerceptualLoss
from partseg_tpu.losses.vgg import VGG19Features, random_vgg19_params
from partseg_tpu.models.decoder import Decoder
from partseg_tpu.models.encoders import AppearanceEncoder, ShapeEncoder
from partseg_tpu.models.partnet import PartNetConfig

B = 64
S = 128
CFG = PartNetConfig(n_parts=10, img_size=S)


def bench(name, fn, *args, steps=10):
    fn2 = jax.jit(fn)
    out = jax.block_until_ready(fn2(*args))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn2(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / steps
    print(f"{name:28s} {dt*1e3:8.2f} ms   {B/dt:8.0f} img/s", flush=True)
    return dt


def main():
    key = jax.random.key(0)
    x = jax.random.uniform(key, (B, S, S, 3), jnp.float32)

    shape_enc = ShapeEncoder(n_parts=CFG.n_parts, background=CFG.background,
                             depth=CFG.depth, features=CFG.features)
    p_shape = shape_enc.init(key, x)
    bench("shape_enc fwd", lambda p, x: shape_enc.apply(p, x), p_shape, x)
    bench(
        "shape_enc fwd+bwd",
        lambda p, x: jax.grad(lambda p: jnp.sum(shape_enc.apply(p, x) ** 2))(p),
        p_shape, x,
    )

    app_enc = AppearanceEncoder(out_features=CFG.app_features, depth=CFG.depth,
                                features=CFG.features)
    p_app = app_enc.init(key, x)
    bench("app_enc fwd", lambda p, x: app_enc.apply(p, x), p_app, x)

    dec = Decoder(out_size=S, n_scales=CFG.decoder_scales,
                  features=CFG.decoder_features)
    mu = jax.random.uniform(key, (B, 10, 2), minval=-0.5, maxval=0.5)
    sigma = 0.02 * jnp.broadcast_to(jnp.eye(2), (B, 10, 2, 2))
    app = jax.random.normal(key, (B, 10, CFG.app_features))
    p_dec = dec.init(key, mu, sigma, app)
    bench("decoder fwd", lambda p: dec.apply(p, mu, sigma, app), p_dec)
    bench(
        "decoder fwd+bwd",
        lambda p: jax.grad(lambda p: jnp.sum(dec.apply(p, mu, sigma, app)))(p),
        p_dec,
    )

    vgg = VGG19Features(trim_blocks=4)
    p_vgg = random_vgg19_params(vgg, S)
    loss = PerceptualLoss(p_vgg, trim_blocks=4)
    y = x * 0.5
    bench("vgg loss fwd", lambda a: loss(a, x), y)
    bench("vgg loss fwd+bwd", lambda a: jax.grad(lambda a: loss(a, x))(a), y)

    acfg = AugmentConfig()
    sampler = acfg.make_sampler()
    bench(
        "augment pair (tps+jitter)",
        lambda x, k: make_pair(x, k, sampler, acfg)["x_s"],
        x, key,
    )
    tps = sampler.sample(key, B)
    bench("tps warp only", lambda x: sampler.warp(tps, x), x)
    flow = sampler.flow_field(tps, S, S)
    bench("tps flow only", lambda: sampler.flow_field(tps, S, S))
    from partseg_tpu.partops.warp import warp_image

    bench("bilinear gather only", lambda x: warp_image(x, flow), x)

    bench(
        "warp bwd",
        lambda x: jax.grad(lambda x: jnp.sum(warp_image(x, flow)))(x),
        x,
    )


if __name__ == "__main__":
    main()
