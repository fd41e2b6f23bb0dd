"""The compiled train step (SURVEY.md §3.1, TPU build).

One jit region per step: on-device paired augmentation → two-stream
PartNet forward → VGG-perceptual + equivariance losses → grads → Adam
update. Under a data mesh with the batch sharded on "data" and params
replicated, XLA inserts the gradient all-reduce over ICI automatically
— the idiomatic pjit DP of SURVEY.md §2.3.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from partseg_tpu.augment.pair import AugmentConfig, make_pair
from partseg_tpu.augment.tps import TPSSampler
from partseg_tpu.losses.equivariance import equivariance_loss
from partseg_tpu.losses.perceptual import PerceptualLoss
from partseg_tpu.models.partnet import PartNet
from partseg_tpu.train.config import TrainConfig
from partseg_tpu.train.state import TrainState, make_optimizer


def make_train_step(
    cfg: TrainConfig,
    model: PartNet,
    sampler: TPSSampler,
    perceptual: PerceptualLoss,
    axis_name: str | None = None,
    warp_on: bool = True,
) -> Callable[[TrainState, dict, jax.Array], tuple[TrainState, dict]]:
    """Build the (un-jitted) train step closure.

    axis_name=None: caller jits directly (single device / pjit auto-DP).
    axis_name="data": per-shard SPMD body for shard_map — gradients and
    metrics are pmean'd over the axis explicitly. shard_map is the
    multi-chip path: Pallas kernels inside stay shard-local (pjit
    auto-sharding cannot partition custom calls).

    warp_on: STATIC. For augment.warp_every>1 schedules the caller
    (train/loop.build_step_fn, bench.py) compiles TWO graphs — this one
    with the TPS warp and one without — and alternates them by host
    step index. The schedule is step-deterministic, so it belongs at
    trace time; a lax.cond formulation was measured to compile
    pathologically and leak host memory per step (see
    augment/pair.py:AugmentConfig.warp_every).

    If `batch` contains "aug_id" (global sample ids), augmentation keys
    are derived per sample, so the draw is identical regardless of the
    device topology.
    """
    optimizer = make_optimizer(cfg.optim)
    lw = cfg.loss

    def loss_fn(params, batch: dict, key: jax.Array):
        images = batch["image"]
        if images.dtype == jnp.uint8:
            # uint8 host batches (native loader fast path): 4× smaller
            # host→device transfer; normalize on-device where it fuses
            # into the first consumer.
            images = images.astype(jnp.float32) * (1.0 / 255.0)
        if "aug_id" in batch:
            key = jax.vmap(lambda i: jax.random.fold_in(key, i))(batch["aug_id"])
        with jax.named_scope("augment"):
            # Augmentation is input data: stop_gradient guarantees the
            # whole subgraph stays primal-only (otherwise the warp's
            # custom-vjp forward variant — which computes extra tap
            # differences for a backward that is never needed — can be
            # selected under jax.grad).
            #
            # Augment in the MODEL dtype (bf16): the encoders cast their
            # inputs anyway, and at bf16 the fused warp kernel's
            # y-interpolation matmul runs on the fast MXU path (the r1
            # f32 warp was 13 ms/step at B=128 — pure f32-matmul cost).
            # The ORIGINAL f32 images stay the reconstruction target.
            pair = jax.lax.stop_gradient(
                make_pair(
                    images.astype(cfg.model.dtype), key, sampler, cfg.augment,
                    warp_on=warp_on,
                )
            )
        with jax.named_scope("model"):
            out = model.apply(params, pair["x_s"], pair["x_a"])
        with jax.named_scope("loss_rec"):
            l_rec = perceptual(out.recon, images)
        with jax.named_scope("loss_equiv"):
            l_eq, eq_metrics = equivariance_loss(
                sampler, pair["tps"], out.mu_s, out.sigma_s, out.mu_a, out.sigma_a,
                sigma_weight=lw.equiv_sigma_weight,
            )
        loss = lw.rec_weight * l_rec + lw.equiv_weight * l_eq
        metrics = {"rec": l_rec, "equiv": l_eq, **eq_metrics}
        if lw.seg_weight and cfg.model.background:
            with jax.named_scope("loss_seg"):
                l_seg = _seg_consistency(cfg, out)
            loss = loss + lw.seg_weight * l_seg
            metrics["seg"] = l_seg
        if lw.swap_weight:
            # Appearance-swap consistency [B:8,10]: shape must survive
            # appearance transfer (SURVEY.md §3.4 stack, in-batch roll).
            from partseg_tpu.models.partnet import PartNet

            app_sw = jnp.roll(out.appearance, 1, axis=0)
            recon_sw = model.apply(
                params, out.mu_a, out.sigma_a, app_sw, method=PartNet.decode
            )
            logits_sw = model.apply(params, recon_sw, method=PartNet.encode_shape)
            _, mu_sw, _ = model.apply(params, logits_sw, method=PartNet.shape_stats)
            l_swap = jnp.mean(
                jnp.sum((mu_sw - out.mu_a.astype(jnp.float32)) ** 2, axis=-1)
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
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state
        )
        return new_state, metrics

    return train_step


def make_train_period(
    cfg: TrainConfig,
    model: PartNet,
    sampler: TPSSampler,
    perceptual: PerceptualLoss,
    axis_name: str | None = None,
) -> Callable[[TrainState, tuple, jax.Array], tuple[TrainState, dict]]:
    """One compiled program executing a FULL augment.warp_every period:
    sub-step 0 TPS-warps (warp_on=True), sub-steps 1..N-1 train
    warp-free. Takes a TUPLE of N batch dicts (one per sub-step) and
    applies N sequential optimizer updates.

    Why unroll instead of alternating two jitted executables: the
    schedule must live in ONE executable to keep dispatch pipelining —
    alternating two jitted programs through a remote-device transport
    measured 28 vs 170 img/s in the real training loop (the per-step
    executable switch forces a sync; docs/perf_ledger.md r4). Unrolling
    is the trace-time analog of a lax.cond-free schedule: no
    data-dependent control flow, one compiled program, N× fewer
    dispatches.

    Metrics: the element-wise MEAN over the period (what a logger
    sampling every k steps expects), plus "loss_warp_on" /
    "loss_warp_off" for the two schedule phases.
    """
    subs = [
        make_train_step(cfg, model, sampler, perceptual, axis_name,
                        warp_on=(i == 0))
        for i in range(cfg.augment.warp_every)
    ]
    return compose_period(subs)


def compose_period(subs: list) -> Callable:
    """Sequence N sub-step closures into one period body (see
    make_train_period). Each sub derives its own RNG by folding the
    shared key with state.step, which increments between subs."""

    def period_step(state: TrainState, batches: tuple, key: jax.Array,
                    *extra):
        # *extra: optional trailing args (the device_data HBM table)
        # forwarded verbatim to every sub-step — they must be jit
        # ARGUMENTS, not closures: the axon remote-compile serializes
        # closed-over arrays into the HLO body (a 402 MB table blew its
        # HTTP length limit with a 413).
        ms = []
        for fn, b in zip(subs, batches):
            state, m = fn(state, b, key, *extra)  # fn folds key w/ step
            ms.append(m)
        metrics = jax.tree.map(lambda *xs: jnp.mean(jnp.stack(xs)), *ms)
        metrics["loss_warp_on"] = ms[0]["loss"]
        metrics["loss_warp_off"] = ms[-1]["loss"]
        return state, metrics

    return period_step


def compose_scan(body: Callable, scan_groups: int, data_echo: int = 1) -> Callable:
    """Wrap a step/period body in ``lax.scan`` over ``scan_groups``
    stacked fetch groups: ONE dispatch executes
    scan_groups × data_echo × (body's steps) optimizer updates.

    ``xs`` is the body's batch argument with every leaf stacked on a
    new leading [scan_groups] axis (one fetch group per scan
    iteration). Each group is applied ``data_echo`` consecutive times
    (same batch, fresh step-folded augmentation keys) — the on-device
    analog of the loop's echo re-dispatch.

    SAME STEP SEQUENCE as dispatching the body sequentially: the carry
    is the same TrainState, every sub-step derives its RNG by folding
    the shared key with state.step, and batches/aug_ids arrive in the
    identical order (tests/test_train.py::test_scan_groups_loop_exact
    pins the loss trajectory and data stream). Numerics are NOT
    bit-identical: the scan body and the per-period program are
    different XLA executables, so params drift at cross-executable
    roundoff level — invisible in losses (~1e-5 rel) but
    Adam-amplified up to O(lr·steps) on near-zero-gradient leaves.
    This is purely a dispatch-overhead lever: remote transports (the
    axon tunnel) serialize a host round trip per dispatch, which at
    sub-10ms steps dominates wall time; scan amortizes it by
    scan_groups×. Metrics are the element-wise mean over the whole
    dispatch.
    """

    def scan_dispatch(state: TrainState, stacked, key: jax.Array, *extra):
        # *extra (e.g. the device_data table) is closed over INSIDE the
        # scan body — as a tracer of scan_dispatch it lowers to a scan
        # constant input, not an HLO constant (see compose_period).
        def group_body(st, batches):
            ms = []
            for _ in range(data_echo):
                st, m = body(st, batches, key, *extra)  # folds key w/ step
                ms.append(m)
            m = (
                ms[0]
                if data_echo == 1
                else jax.tree.map(lambda *xs: jnp.mean(jnp.stack(xs)), *ms)
            )
            return st, m

        state, ms = jax.lax.scan(group_body, state, stacked)
        metrics = jax.tree.map(lambda x: jnp.mean(x, axis=0), ms)
        return state, metrics

    return scan_dispatch


def _seg_consistency(cfg: TrainConfig, out) -> jax.Array:
    """Cross-entropy between the per-pixel part softmax (K+bg) and the
    stop-grad occupancy of the rendered Gaussians: a pixel belongs to
    part k with weight φ_k(u), to background with weight (1 − max_k φ_k).
    Trains the dense-segmentation head off the learned geometry."""
    from partseg_tpu.partops.moments import precision_from_cov
    from partseg_tpu.partops.render import render_gaussians

    logits = out.logits_a                              # [B, h, w, K+1]
    b, h, w, _ = logits.shape
    lam = precision_from_cov(out.sigma_a)
    phi = render_gaussians(out.mu_a, out.sigma_a, h, w, precision=lam)
    # 1 − Σφ (not 1 − max φ): boundary pixels where a part renders at
    # moderate strength should belong to the part, not background.
    bg = jnp.clip(1.0 - jnp.sum(phi, axis=-1, keepdims=True), 0.0, 1.0)
    target = jnp.concatenate([phi, bg], axis=-1)
    target = jax.lax.stop_gradient(
        target / (jnp.sum(target, axis=-1, keepdims=True) + 1e-8)
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(target * logp, axis=-1))
