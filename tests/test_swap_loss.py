"""Appearance-swap consistency loss test ([B:8,10])."""

import jax
import numpy as np

from partseg_tpu.train.step import make_train_step
from partseg_tpu.train.loop import build_perceptual
from partseg_tpu.train.state import create_state
from partseg_tpu.models.partnet import PartNet
import dataclasses

from tests.test_train import TINY


def test_swap_loss_present_and_finite():
    cfg = TINY.replace(loss=dataclasses.replace(TINY.loss, swap_weight=0.5))
    model = PartNet(cfg.model)
    state = create_state(cfg, model, jax.random.key(0))
    step_fn = jax.jit(
        make_train_step(cfg, model, cfg.augment.make_sampler(), build_perceptual(cfg))
    )
    img = np.random.default_rng(0).uniform(0, 1, (4, 16, 16, 3)).astype(np.float32)
    new_state, metrics = step_fn(state, {"image": img}, jax.random.key(1))
    assert "swap" in metrics
    assert np.isfinite(float(metrics["swap"]))
    assert np.isfinite(float(metrics["loss"]))
    # Loss includes the swap term (plus the default seg-consistency term).
    base = (
        1.0 * float(metrics["rec"])
        + 1.0 * float(metrics["equiv"])
        + cfg.loss.seg_weight * float(metrics.get("seg", 0.0))
    )
    assert abs(float(metrics["loss"]) - base - 0.5 * float(metrics["swap"])) < 1e-4
