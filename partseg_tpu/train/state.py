"""Train state: params + optimizer state + step (flax.struct pytree)."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from partseg_tpu.models.partnet import PartNet
from partseg_tpu.train.config import OptimConfig, TrainConfig


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.lr,
        warmup_steps=cfg.warmup_steps,
        decay_steps=cfg.decay_steps,
        end_value=cfg.lr * cfg.end_lr_factor,
    )
    tx = [optax.clip_by_global_norm(cfg.grad_clip)] if cfg.grad_clip else []
    tx.append(
        optax.adamw(sched, b1=cfg.b1, b2=cfg.b2, weight_decay=cfg.weight_decay)
        if cfg.weight_decay
        else optax.adam(sched, b1=cfg.b1, b2=cfg.b2)
    )
    return optax.chain(*tx)


def create_state(cfg: TrainConfig, model: PartNet, key: jax.Array) -> TrainState:
    s = cfg.model.img_size
    x = jnp.zeros((1, s, s, 3), jnp.float32)
    params = model.init(key, x, x)
    opt = make_optimizer(cfg.optim)
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=opt.init(params)
    )
