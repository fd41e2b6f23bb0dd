"""The training loop (edflow-iterator parity, SURVEY.md §3.1 TPU build).

Orchestration only — all math lives in the jitted step. Features:
restore-latest on start (preemption-safe), async Orbax checkpoints,
JSONL+TB metrics, throughput measurement, optional profiler window
(SURVEY.md §5.1), fault-injection step for resume testing (§5.3).
"""

from __future__ import annotations

import os
import time
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from partseg_tpu.data.loader import make_loader
from partseg_tpu.data.registry import build_dataset
from partseg_tpu.dist.mesh import (
    batch_sharding,
    create_replicated,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from partseg_tpu.losses.perceptual import PerceptualLoss
from partseg_tpu.losses.vgg import VGG19Features, load_vgg19_npz
from partseg_tpu.models.partnet import PartNet
from partseg_tpu.train.checkpoint import CheckpointManager
from partseg_tpu.train.config import TrainConfig
from partseg_tpu.train.metrics import MetricLogger
from partseg_tpu.train.state import create_state
from partseg_tpu.train.step import make_train_step


def build_perceptual(cfg: TrainConfig) -> PerceptualLoss:
    lw = cfg.loss
    vgg = VGG19Features(
        extract=tuple(lw.vgg_layers), trim_blocks=lw.vgg_trim_blocks,
        dtype=cfg.model.dtype,
    )
    vgg_params, vgg_mode = load_vgg19_npz(vgg, lw.vgg_npz, cfg.model.img_size)
    return PerceptualLoss(
        vgg_params,
        extract=tuple(lw.vgg_layers),
        layer_weights=lw.vgg_layer_weights,
        pixel_weight=lw.pixel_weight,
        trim_blocks=lw.vgg_trim_blocks,
        feature_resolution=lw.vgg_resolution,
        dtype=cfg.model.dtype,
        vgg_mode=vgg_mode,
    )


def build_step_fn(cfg, model, sampler, perceptual, mesh, device_dataset=None):
    """Compile the train step for the mesh.

    device_dataset (cfg.device_data): an HBM-resident [N, H, W, 3]
    replicated array of ALL dataset images. The step body then takes
    batches of {"index", "aug_id"} and gathers images on-device —
    host→device traffic per step shrinks to B int32s. The gather is
    row-local under DP (indices are global dataset ids, the table is
    replicated), so it composes with shard_map/warp_every/scan.

    Multi-device: shard_map with explicit pmean — required so Pallas
    kernels stay shard-local (pjit auto-sharding can't partition custom
    calls). Single device: plain jit. A ("data", "space") mesh routes
    to the spatially-sharded step (parallel/spatial_train.py).

    augment.warp_every > 1: the warp schedule is step-deterministic, so
    the FULL period is unrolled into ONE compiled program (sub-step 0
    warps, the rest don't; N sequential updates per dispatch). The
    returned callable (marked with a `warp_period` attribute) takes a
    TUPLE of N batch dicts. One executable is load-bearing: alternating
    two jitted programs per step measured 28 vs 170 img/s in the real
    loop (executable switches break dispatch pipelining), and a
    lax.cond formulation compiled pathologically and leaked host
    memory per step (docs/perf_ledger.md r4).
    """
    from jax.sharding import PartitionSpec as P

    from partseg_tpu.train.step import compose_period, compose_scan

    every = cfg.augment.warp_every
    scan = cfg.scan_groups
    spatial = "space" in mesh.axis_names
    if device_dataset is not None and spatial:
        raise ValueError(
            "device_data is not supported with spatial sharding: the "
            "image must enter the step already row-sharded, but the "
            "HBM table gather produces full-height rows per shard"
        )

    if spatial:
        from partseg_tpu.parallel.spatial_train import make_spatial_train_step

        def make_body(warp_on):
            return make_spatial_train_step(
                cfg, sampler, perceptual, warp_on=warp_on
            )

        batch_spec = {"image": P("data", "space"), "aug_id": P("data")}
    elif mesh.size > 1:

        def make_body(warp_on):
            return make_train_step(
                cfg, model, sampler, perceptual, axis_name="data",
                warp_on=warp_on,
            )

        batch_spec = {"image": P("data"), "aug_id": P("data")}
    else:

        def make_body(warp_on):
            return make_train_step(
                cfg, model, sampler, perceptual, warp_on=warp_on
            )

        batch_spec = None

    if device_dataset is not None:
        make_model_body = make_body

        def make_body(warp_on):
            fn = make_model_body(warp_on)

            def gathered(state, batch, key, table):
                # On-device image fetch: indices are global dataset ids;
                # the table is replicated, so the gather needs no
                # collective. The table is a real jit ARGUMENT (threaded
                # through compose_period/compose_scan as *extra), NOT a
                # closure: closed-over arrays are serialized into the
                # lowered HLO, and the axon remote-compile rejected the
                # 402 MB study table with HTTP 413. As a device-resident
                # argument only its handle ships per dispatch.
                b = dict(batch)
                b["image"] = table[b.pop("index")]
                return fn(state, b, key)

            return gathered

        if batch_spec is not None:
            batch_spec = {"index": P("data"), "aug_id": P("data")}

    if every <= 1:
        body = make_body(True)
        spec = batch_spec
    else:
        body = compose_period([make_body(i == 0) for i in range(every)])
        spec = None if batch_spec is None else tuple([batch_spec] * every)

    if scan > 1:
        # lax.scan over stacked fetch groups (train/step.compose_scan):
        # one dispatch = scan*every*data_echo steps, same step sequence
        # (roundoff-level cross-executable drift only — see compose_scan).
        # The scan sits INSIDE shard_map (collectives are explicit
        # pmeans in the sub-steps, legal under scan).
        body = compose_scan(body, scan, cfg.data_echo)
        if spec is not None:
            spec = jax.tree.map(
                lambda s: P(*((None,) + tuple(s))), spec,
                is_leaf=lambda x: isinstance(x, P),
            )

    if batch_spec is not None:
        # check_vma=False: pallas_call's out_shape carries no
        # varying-mesh-axes annotation, so the new shard_map VMA checker
        # rejects any Pallas kernel in the body. Collectives are explicit
        # (pmean in the step) so the check adds nothing here.
        in_specs = (P(), spec, P())
        if device_dataset is not None:
            in_specs += (P(),)        # the HBM table: fully replicated
        body = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=(P(), P()),
            check_vma=False,
        )
    jit_fn = jax.jit(body, donate_argnums=0)
    if device_dataset is None:
        fn = jit_fn
    else:
        # Inject the table at the PYTHON level (outside the jit
        # boundary): the loop keeps calling step_fn(state, batches,
        # key) while the executable receives it as an argument.
        def fn(state, batches, key):
            return jit_fn(state, batches, key, device_dataset)

    if every <= 1 and scan <= 1:
        return fn

    def period_fn(state, batches, key):
        return fn(state, batches, key)

    period_fn.warp_period = every
    period_fn.scan_groups = scan
    return period_fn


def train(
    cfg: TrainConfig,
    *,
    data_iter: Iterator[dict] | None = None,
    restore: bool = True,
    mesh=None,
) -> Any:
    """Run training. Returns the final TrainState (host-fetched)."""
    if mesh is None:
        if cfg.space_shards > 1:
            from partseg_tpu.dist.mesh import make_spatial_mesh

            mesh = make_spatial_mesh(cfg.space_shards)
        else:
            mesh = make_mesh()
    n_dev = mesh.size                 # throughput normalizer: every chip works
    n_data = mesh.size // (
        mesh.shape["space"] if "space" in mesh.axis_names else 1
    )  # the batch shards over "data" only
    if cfg.global_batch % n_data:
        raise ValueError(
            f"global_batch {cfg.global_batch} not divisible by {n_data} "
            "data shards"
        )
    per_host_batch = cfg.global_batch // jax.process_count()

    model = PartNet(cfg.model)
    sampler = cfg.augment.make_sampler()
    perceptual = build_perceptual(cfg)
    print(f"[train] vgg_mode={perceptual.vgg_mode}")

    # SPMD init: identical on every host, placed as global replicated
    # arrays (device_put cannot target other hosts' devices).
    state = create_replicated(
        lambda: create_state(cfg, model, jax.random.key(cfg.seed)), mesh
    )

    ckpt = CheckpointManager(cfg.ckpt_dir, keep=cfg.ckpt_keep, save_every=cfg.ckpt_every)
    start_step = 0
    if restore:
        restored = ckpt.restore_latest(state)
        if restored is not None:
            state, start_step = restored
            print(f"[train] restored checkpoint at step {start_step}")

    device_ds = None
    if cfg.device_data:
        if data_iter is not None:
            raise ValueError(
                "device_data builds its own index-carrying loader; pass "
                "data_iter=None"
            )
        if cfg.loader_backend != "grain":
            raise ValueError(
                "device_data requires loader_backend='grain' (the native "
                "decode pool has no per-example index plumbing)"
            )

    if data_iter is None:
        from partseg_tpu.data.loader import prefetch

        dataset = build_dataset(cfg.dataset, split="train", **dict(cfg.dataset_kwargs))
        if cfg.device_data:
            dataset = _IndexedDataset(dataset)
            device_ds = _device_dataset_table(dataset, mesh,
                                              u8=cfg.device_data_u8)
        # start_batch=start_step IS the data-iterator checkpoint: one
        # batch per step, so seeking to the restored step reproduces the
        # uninterrupted batch sequence exactly (SURVEY.md §5.4). Callers
        # passing their own data_iter own this seek themselves.
        # data_echo>1 consumes one batch per E steps, so the seek target
        # is start_step // E (loop group alignment is validated below).
        data_iter = prefetch(
            make_loader(
                dataset, per_host_batch, seed=cfg.seed, num_workers=4,
                backend=cfg.loader_backend,
                start_batch=start_step // cfg.data_echo,
            )
        )

    step_fn = build_step_fn(cfg, model, sampler, perceptual, mesh,
                            device_dataset=device_ds)
    viz_fn = jax.jit(lambda p, a: model.apply(p, a, a))  # compiled once

    # One writer per run dir: only process 0 even CONSTRUCTS the logger
    # (the constructor opens metrics.jsonl and a TB event file — doing
    # that on every host would leave stray writers behind).
    logger = MetricLogger(cfg.ckpt_dir) if jax.process_index() == 0 else None
    base_key = create_replicated(lambda: jax.random.key(cfg.seed + 1), mesh)
    if "space" in mesh.axis_names:
        from jax.sharding import NamedSharding, PartitionSpec as P

        bsh = NamedSharding(mesh, P("data", "space"))   # image rows
        bsh_id = NamedSharding(mesh, P("data"))
    else:
        bsh = batch_sharding(mesh)
        bsh_id = bsh

    # warp_every>1: the loop advances one PERIOD per dispatch (the
    # whole period is one compiled program — build_step_fn). Batches
    # stay 1:1 with sub-steps, so data-iterator seek arithmetic is
    # unchanged; checkpoints are only written at period boundaries, so
    # restores are always aligned.
    period = getattr(step_fn, "warp_period", 1)
    # data_echo>1: one fetch group (period batches) is re-dispatched E
    # times before fetching again; the fetch/seek arithmetic needs step
    # boundaries aligned to period*E (checkpoints land on multiples of
    # ckpt_every, which the group check below covers on resume).
    echo = cfg.data_echo
    if echo < 1:
        raise ValueError(f"data_echo must be >= 1, got {echo}")
    group = period * echo
    # scan_groups>1: one dispatch covers `scan` fetch groups via
    # lax.scan (compose_scan) — echo re-dispatch moves ON-device, the
    # host stacks scan*period batches into one transfer per sub-slot.
    scan = getattr(step_fn, "scan_groups", 1)
    span = group * scan                 # optimizer steps per dispatch
    stride = period if scan == 1 else span
    if scan > 1:
        if cfg.fault_injection_step is not None:
            raise ValueError(
                "fault_injection_step targets a single sub-step; it is "
                "not supported with scan_groups>1 (a dispatch is "
                f"{span} steps)"
            )
        if start_step % span or (cfg.steps - start_step) % span:
            raise ValueError(
                f"steps {start_step}..{cfg.steps} must align to "
                f"warp_every*data_echo*scan_groups={span} (one scan "
                "dispatch is indivisible)"
            )
        if cfg.ckpt_every % span:
            raise ValueError(
                f"ckpt_every={cfg.ckpt_every} must be a multiple of "
                f"warp_every*data_echo*scan_groups={span}: checkpoints "
                "only land on dispatch boundaries"
            )
    if group > 1:
        if start_step % group:
            raise ValueError(
                f"restored step {start_step} is not aligned to "
                f"augment.warp_every*data_echo={group}; scheduled runs "
                "only checkpoint at group boundaries — this checkpoint "
                "came from a different schedule"
            )
        if (cfg.steps - start_step) % group:
            raise ValueError(
                f"steps={cfg.steps} must be a multiple of "
                f"augment.warp_every*data_echo={group} (the schedule "
                "period compiles as one program; echo re-dispatches it)"
            )
        if cfg.ckpt_every % group:
            raise ValueError(
                f"ckpt_every={cfg.ckpt_every} must be a multiple of "
                f"augment.warp_every*data_echo={group}: checkpoints only "
                "land on group boundaries, so any other cadence would "
                f"silently stretch to lcm({group}, {cfg.ckpt_every})"
            )

    if scan > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        bsh_stk = NamedSharding(mesh, P(*((None,) + tuple(bsh.spec))))
        bsh_id_stk = NamedSharding(mesh, P(*((None,) + tuple(bsh_id.spec))))

    feed_key = "image" if device_ds is None else "index"
    bsh_feed = bsh if device_ds is None else bsh_id
    if scan > 1:
        bsh_feed_stk = bsh_stk if device_ds is None else bsh_id_stk

    t_last = time.perf_counter()
    imgs_since = 0
    echoed_batches = None
    viz_host_batch = None
    for step in range(start_step, cfg.steps, stride):
        if cfg.profile_steps and step <= cfg.profile_steps[0] < step + stride:
            jax.profiler.start_trace(os.path.join(cfg.ckpt_dir, "profile"))

        def _host_batch(fetch_step: int, sub: int) -> dict:
            batch = next(data_iter)
            # Global sample ids drive per-sample augmentation keys,
            # making the draw identical under any sharding (see step.py).
            aug_id = (
                np.arange(per_host_batch, dtype=np.int32)
                + jax.process_index() * per_host_batch
                + (fetch_step + sub) * cfg.global_batch
            )
            hb = {"image": batch["image"], "aug_id": aug_id}
            if device_ds is not None:
                hb["index"] = batch["index"]
            return hb

        def _device_batch(sub: int) -> dict:
            # device_data: ship indices (B int32s), not images — the
            # step gathers from the HBM-resident table on-device.
            hb = _host_batch(step, sub)
            return {
                feed_key: _globalize(hb[feed_key], bsh_feed),
                "aug_id": _globalize(hb["aug_id"], bsh_id),
            }

        if scan > 1:
            # One dispatch = `scan` fetch groups: stack on HOST (one
            # transfer per sub-slot instead of scan*period), scan slices
            # the leading axis on device. Fetch order is group-major —
            # identical to `scan` sequential dispatches, so seek
            # arithmetic and aug_ids are unchanged.
            hosts = [
                [_host_batch(step + g * group, j) for j in range(period)]
                for g in range(scan)
            ]
            stacked = tuple(
                {
                    feed_key: _globalize(
                        np.stack([hosts[g][j][feed_key] for g in range(scan)]),
                        bsh_feed_stk, batch_axis=1,
                    ),
                    "aug_id": _globalize(
                        np.stack([hosts[g][j]["aug_id"] for g in range(scan)]),
                        bsh_id_stk, batch_axis=1,
                    ),
                }
                for j in range(period)
            )
            xs = stacked[0] if period == 1 else stacked
            # Viz batch = this host's raw numpy rows of group 0 / sub 0:
            # zero extra device dispatches (the transport scan exists to
            # amortize), and safe to touch from process 0 alone (no jax
            # computation on the global stacked arrays).
            device_batch = lambda h=hosts: h[0][0]
            state, metrics = step_fn(state, xs, base_key)
        else:
            # data_echo: fetch a fresh group of batches once per E
            # dispatches, re-dispatching the same device arrays in
            # between. Augmentation draws still differ per echo (keys
            # fold state.step, which advances every sub-step); aug_id —
            # which exists for sharding-invariance — repeats across
            # echoes by design. start_step is group-aligned (validated
            # above).
            if step % group == 0 or echoed_batches is None:
                if device_ds is not None:
                    # Keep the fetch group's first HOST batch for viz:
                    # the device dicts carry indices, not images.
                    hbs = [_host_batch(step, j) for j in range(period)]
                    echoed_batches = tuple(
                        {
                            feed_key: _globalize(hb[feed_key], bsh_feed),
                            "aug_id": _globalize(hb["aug_id"], bsh_id),
                        }
                        for hb in hbs
                    )
                    viz_host_batch = hbs[0]
                else:
                    echoed_batches = tuple(
                        _device_batch(j) for j in range(period)
                    )
                    viz_host_batch = None
            batches = echoed_batches
            if viz_host_batch is not None:
                device_batch = lambda h=viz_host_batch: h  # host numpy viz
            else:
                device_batch = lambda b=batches: b[0]  # warp-on sub-step, viz
            if period == 1:
                state, metrics = step_fn(state, batches[0], base_key)
            else:
                state, metrics = step_fn(state, batches, base_key)
        imgs_since += cfg.global_batch * stride

        if cfg.profile_steps and step <= cfg.profile_steps[1] < step + stride:
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()

        if step % cfg.log_every < stride or step + stride >= cfg.steps:
            m = jax.device_get(metrics)      # pmean'd → identical on all hosts
            now = time.perf_counter()
            dt = now - t_last
            m["img_per_sec_per_chip"] = imgs_since / dt / n_dev if dt > 0 else 0.0
            m["lr_step"] = step
            m["vgg_mode"] = perceptual.vgg_mode
            if jax.process_index() == 0:     # one writer per run dir
                logger.log(step, m)
            t_last = now
            imgs_since = 0

        if cfg.image_log_every and step % cfg.image_log_every < stride:
            if jax.process_index() == 0:
                _log_images(logger, viz_fn, state, device_batch(), step)

        if (cfg.fault_injection_step is not None
                and step <= cfg.fault_injection_step < step + stride):
            print(f"[train] FAULT INJECTION at step {step} — exiting hard")
            ckpt.wait()
            os._exit(42)

        if (step + stride) % group == 0:
            # Echoed runs checkpoint only at group boundaries so the
            # resume seek (start_batch = step // E) stays exact.
            ckpt.save(step + stride, state)

    ckpt.save(cfg.steps, state, force=True)
    ckpt.wait()
    if logger is not None:
        logger.close()
    return jax.device_get(state)


class _IndexedDataset:
    """Wraps an indexable dict-example dataset so every example carries
    its dataset index — the key cfg.device_data gathers images by. The
    loader batches it like any other field, so shuffle/shard/seek
    arithmetic (and therefore the batch sequence) is untouched."""

    def __init__(self, dataset):
        self._dataset = dataset

    def __len__(self):
        return len(self._dataset)

    def __getitem__(self, idx):
        return {**self._dataset[idx], "index": np.int32(idx)}


def _device_dataset_table(dataset, mesh, limit_bytes=8 << 30, u8=False):
    """Materialize the whole dataset's images as one replicated HBM
    array [N, H, W, 3] (cfg.device_data). Paid once at startup; every
    train step then gathers its batch on-device by index.

    u8 (cfg.device_data_u8): store the table as uint8 — float images
    in [0,1] are quantized round(x*255), exactly the representation a
    JPEG-decoding host loader ships — for 4× the HBM capacity of an
    f32 table. The step already normalizes uint8 batches on-device
    (train/step.py uint8 fast path), so the gathered rows take the
    same code path as host u8 batches."""

    def _prep(img):
        img = np.asarray(img)
        if u8 and img.dtype != np.uint8:
            img = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
        return img

    n = len(dataset)
    first = _prep(dataset[0]["image"])
    nbytes = n * first.nbytes
    if nbytes > limit_bytes:
        raise ValueError(
            f"device_data: dataset images are {nbytes / 2**30:.1f} GiB "
            f"({n} examples x {first.nbytes / 2**20:.2f} MiB) — too large "
            "for an HBM-resident table; use the streaming loader"
            + ("" if u8 else " or device_data_u8=True (4x capacity)")
        )
    table = np.empty((n,) + first.shape, first.dtype)
    table[0] = first
    for i in range(1, n):
        table[i] = _prep(dataset[i]["image"])
    from jax.sharding import NamedSharding, PartitionSpec as P

    # Fully replicated: every process holds the full table (datasets
    # small enough for HBM residence are loadable per-host), so
    # device_put with a replicated global sharding is multi-host legal.
    return jax.device_put(
        table, NamedSharding(mesh, P(*((None,) * table.ndim)))
    )


def _globalize(host_array, sharding, batch_axis: int = 0):
    """Assemble a per-host batch shard into a global sharded array.

    Single-process: plain device_put. Multi-host: each process
    contributes its local shard of the global batch (DCN-correct;
    device_put of host-local data with a global sharding would be
    wrong there).

    batch_axis: the axis each process contributes a shard of — 0 for
    plain batches, 1 for scan_groups>1 stacks whose leading axis is the
    [scan] dimension (replicated across hosts, NOT scaled)."""
    if jax.process_count() == 1:
        return jax.device_put(host_array, sharding)
    global_shape = list(host_array.shape)
    global_shape[batch_axis] *= jax.process_count()
    return jax.make_array_from_process_local_data(
        sharding, host_array, tuple(global_shape)
    )


def _host_local_rows(arr, n: int):
    """First n batch rows of THIS host's addressable shards of a global
    array.

    Multi-host safe: global-array `[:n]` indexing would touch
    non-addressable shards living on other hosts. Logging only needs a
    few sample images, so process-local rows are the right content.

    Handles 2-D ("data", "space") shardings too: shards of the same
    batch slice are image-row pieces — reassemble them along axis 1
    before stacking batch groups (a plain axis-0 concat would log
    half-height images as separate samples)."""
    if isinstance(arr, np.ndarray):      # host numpy viz batch (scan path)
        return arr[:n]
    groups: dict[int, list] = {}
    seen = set()
    for s in arr.addressable_shards:
        key = tuple((sl.start, sl.stop) for sl in s.index)
        if key in seen:           # replicas (unsharded mesh axes)
            continue
        seen.add(key)
        groups.setdefault(s.index[0].start or 0, []).append(s)
    batches = []
    for b0 in sorted(groups):
        parts = sorted(
            groups[b0],
            key=lambda s: (s.index[1].start or 0) if len(s.index) > 1 else 0,
        )
        batches.append(
            np.concatenate([np.asarray(s.data) for s in parts], axis=1)
            if len(parts) > 1
            else np.asarray(parts[0].data)
        )
    return np.concatenate(batches)[:n]


def _log_images(logger: MetricLogger, viz_fn, state, batch, step: int):
    """edflow log_op parity (SURVEY.md §5.5): recon + part-map overlays."""
    import numpy as np

    n = min(8, batch["image"].shape[0])
    x = _host_local_rows(batch["image"], n)
    if x.dtype == np.uint8:
        # Mirror step.py's uint8 fast path: the model expects [0,1].
        x = x.astype(np.float32) * (1.0 / 255.0)
    # Fetch params to host and run the viz forward on process-local
    # devices only: this function runs on process 0 alone, and invoking
    # a computation on global arrays committed to the full multi-process
    # mesh from a single process would deadlock the other hosts.
    params = jax.device_get(state.params)  # fully replicated → host copy
    out = viz_fn(params, x)
    heat = np.asarray(out.parts_a)                    # [n, h, w, K]
    # Color-code parts by index for a single overlay image.
    k = heat.shape[-1]
    rng = np.random.default_rng(0)
    palette = rng.uniform(0.2, 1.0, size=(k, 3))
    overlay = np.einsum("bhwk,kc->bhwc", heat / (heat.max() + 1e-8), palette)
    logger.log_images(
        step,
        {
            "input": np.asarray(x),
            "recon": np.asarray(out.recon, dtype=np.float32),
            "parts": np.clip(overlay / (overlay.max() + 1e-8), 0, 1),
        },
    )
