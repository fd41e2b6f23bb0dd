"""Paired augmentation driver — the load-bearing coupling.

Role parity: the reference's `make_pair` (SURVEY.md §2.1 "Paired
augmentation driver", [B:5,8]). One rng produces the two coupled views:

  x_s = TPS-warp(x)      "spatial view"    — geometry changed, appearance kept
  x_a = jitter(x)        "appearance view" — appearance changed, geometry kept

plus the TPS transform itself (point transform + Jacobian), which the
equivariance loss needs: the shape stream runs on BOTH views, and
T(μ(x_s)) must match μ(x_a) (SURVEY.md §3.1).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from partseg_tpu.augment.color import color_jitter, sample_color_params
from partseg_tpu.augment.tps import TPSParams, TPSSampler


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Static augmentation hyperparameters (SURVEY.md §5.6 "TPS magnitudes")."""

    tps_grid: int = 5
    tps_scale_sd: float = 0.08
    tps_rot_sd: float = 0.08
    tps_trans_sd: float = 0.08
    tps_ctrl_sd: float = 0.08
    brightness: float = 0.1
    contrast: float = 0.3
    saturation: float = 0.3
    hue: float = 0.3
    # Optionally also TPS-warp the appearance view with an independent warp
    # (kept as a knob; default off = paper setup, SURVEY.md §7.4 risk 1).
    warp_appearance_view: bool = False
    # Apply the TPS warp only on every N-th step (perf knob; the warp
    # custom call is ~32% of the r3 speed step). On off-steps x_s is the
    # un-warped image and the returned transform is the exact identity,
    # so the equivariance loss degrades gracefully into a color-jitter
    # invariance term. 1 = paper setup (warp every step). Quality-gated
    # like every other speed rung (tools/quality_study.py).
    #
    # The schedule is step-deterministic, so it is specialized at TRACE
    # time: the whole period is unrolled into ONE compiled program
    # (warp-on sub-step + warp-free sub-steps; make_pair's static
    # `warp_on`, train/step.make_train_period). Two rejected
    # formulations, both measured: a traced lax.cond compiled
    # pathologically slowly and leaked host memory per step; two
    # alternating jitted executables broke dispatch pipelining (28 vs
    # 170 img/s in the real loop). Data-independent control flow
    # belongs at trace time, in one executable.
    warp_every: int = 1
    # Warp only the first ceil(B·f) samples of each (per-shard) batch;
    # the rest pass through with the exact-identity transform. Unlike
    # warp_every (full batch every N-th step), this keeps equivariance
    # signal in EVERY step at 1/f of the warp kernel cost — the warp
    # runs on a B·f sub-batch, so its custom call and the layout copies
    # around it shrink proportionally. 1.0 = paper setup. STATIC knob
    # (the split is a trace-time slice — no control flow). Composes
    # with warp_every (fraction applies on warp-on sub-steps).
    #
    # Sharding note: "first ceil(B·f)" is evaluated per data shard, so
    # WHICH samples get warped depends on the topology (the warped
    # count and all random draws do not — draws stay aug_id-keyed).
    # Loader order is already random, so the selection is distribution-
    # identical; exact cross-topology bitwise parity holds only for
    # warp_fraction=1, which the DP-parity test pins.
    warp_fraction: float = 1.0
    padding_mode: str = "border"
    warp_impl: str = "auto"   # "auto" | "fused" | "gather"

    def make_sampler(self) -> TPSSampler:
        return TPSSampler(
            grid_size=self.tps_grid,
            scale_sd=self.tps_scale_sd,
            rot_sd=self.tps_rot_sd,
            trans_sd=self.tps_trans_sd,
            ctrl_sd=self.tps_ctrl_sd,
        )


def make_pair(
    x: jax.Array,
    key: jax.Array,
    sampler: TPSSampler,
    cfg: AugmentConfig,
    warp_on: bool = True,
) -> dict[str, Any]:
    """Produce the coupled (x_s, x_a) views + transform params.

    Args:
      x: [B, H, W, 3] images in [0, 1].
      key: one PRNG key — the single source of the pairing.
      sampler: TPSSampler built from cfg (hoisted out so its
        precomputed basis constants are jit-time constants).
      warp_on: STATIC python bool (trace-time, for warp_every
        schedules). False builds the off-step graph: no warp kernel at
        all, x_s is the input, and the returned tps is the exact
        identity so downstream equivariance transport matches what was
        applied. Color-jitter draws are unchanged (independent key
        split), so on/off graphs stay rng-consistent.

    Returns dict:
      x_s: spatially warped view, x_a: color-jittered view,
      tps: TPSParams of the warp applied to x_s (T maps x_s-frame
           points to x-frame points), color: ColorParams.
    """
    b = x.shape[0]
    per_sample = getattr(key, "ndim", 0) == 1 and key.shape[0] == b
    if per_sample:
        # key is a [B] key array: draws are per-sample and therefore
        # identical no matter how the batch is sharded over devices.
        ks = jax.vmap(lambda k: jax.random.split(k, 3))(key)  # [B, 3]
        k_tps, k_col, k_tps2 = ks[:, 0], ks[:, 1], ks[:, 2]
        tps = sampler.sample_per_key(k_tps)
        col = jax.vmap(
            lambda k: sample_color_params(
                k, (), cfg.brightness, cfg.contrast, cfg.saturation, cfg.hue
            )
        )(k_col)
    else:
        k_tps, k_col, k_tps2 = jax.random.split(key, 3)
        tps = sampler.sample(k_tps, b)
        col = sample_color_params(
            k_col, b, cfg.brightness, cfg.contrast, cfg.saturation, cfg.hue
        )

    def _warp(params: TPSParams, img: jax.Array) -> jax.Array:
        return sampler.warp(
            params, img, padding_mode=cfg.padding_mode, impl=cfg.warp_impl
        )

    frac = float(cfg.warp_fraction)
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"warp_fraction must be in (0, 1], got {frac}")
    if warp_on and frac < 1.0:
        # Static sub-batch split: warp the first nw samples, pass the
        # rest through with the exact identity (same graceful
        # degradation as a warp_every off-step, but per sample — every
        # step keeps some true-warp equivariance pairs).
        import math

        nw = min(b, max(1, math.ceil(b * frac)))
        head = jax.tree.map(lambda a: a[:nw], tps)
        x_s = jnp.concatenate([_warp(head, x[:nw]), x[nw:]], axis=0)
        ident = sampler.identity(b - nw)
        tps = jax.tree.map(
            lambda hd, i: jnp.concatenate([hd, i.astype(hd.dtype)], axis=0),
            head,
            ident,
        )
    elif warp_on:
        x_s = _warp(tps, x)
    else:
        # Off-step graph: the sampled tps is dead code (DCE'd by XLA;
        # the color keys come from an independent split, so draws match
        # the on-graph's), the transform reported downstream is the
        # exact identity.
        tps = jax.tree.map(
            lambda s, i: i.astype(s.dtype), tps, sampler.identity(b)
        )
        x_s = x
    x_a = color_jitter(x, col)
    if cfg.warp_appearance_view:
        tps2 = (
            sampler.sample_per_key(k_tps2)
            if per_sample
            else sampler.sample(k_tps2, b)
        )
        if warp_on:
            x_a = _warp(tps2, x_a)

    return {"x_s": x_s, "x_a": x_a, "tps": tps, "color": col}
