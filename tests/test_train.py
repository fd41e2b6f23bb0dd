"""Training-layer tests: DP-vs-single-device parity, loader sharding,
config overrides, short smoke train (SURVEY.md §4.3–4.4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from partseg_tpu.augment.pair import AugmentConfig
from partseg_tpu.data.loader import make_loader
from partseg_tpu.data.registry import build_dataset
from partseg_tpu.data.synthetic import SyntheticBlobs
from partseg_tpu.dist.mesh import batch_sharding, make_mesh, replicated_sharding
from partseg_tpu.models.partnet import PartNet, PartNetConfig
from partseg_tpu.train.config import (
    LossConfig,
    OptimConfig,
    TrainConfig,
    apply_overrides,
)
from partseg_tpu.train.loop import build_perceptual, train
from partseg_tpu.train.state import create_state
from partseg_tpu.train.step import make_train_step

TINY = TrainConfig(
    model=PartNetConfig(n_parts=3, img_size=16, features=16, depth=1,
                        app_features=8, decoder_scales=2, use_pallas=False),
    augment=AugmentConfig(tps_grid=3),
    loss=LossConfig(vgg_layers=("relu1_2",), vgg_trim_blocks=1),
    optim=OptimConfig(lr=1e-3, warmup_steps=10, decay_steps=100),
    dataset="synthetic",
    dataset_kwargs=(("size", 16), ("n_blobs", 3), ("n_examples", 64)),
    global_batch=8,
    steps=3,
    log_every=1,
    ckpt_every=1000,
)


def _build(cfg):
    model = PartNet(cfg.model)
    sampler = cfg.augment.make_sampler()
    perceptual = build_perceptual(cfg)
    state = create_state(cfg, model, jax.random.key(0))
    step_fn = make_train_step(cfg, model, sampler, perceptual)
    return model, state, step_fn


def test_dp_matches_single_device():
    # SURVEY.md §4.3: 8-fake-device shard_map DP train_step loss/params
    # match single-device within tolerance. Per-sample aug ids make the
    # augmentation draw sharding-invariant.
    from partseg_tpu.train.loop import build_step_fn

    cfg = TINY
    model = PartNet(cfg.model)
    sampler = cfg.augment.make_sampler()
    perceptual = build_perceptual(cfg)
    state = create_state(cfg, model, jax.random.key(0))
    img = np.random.default_rng(0).uniform(0, 1, (8, 16, 16, 3)).astype(np.float32)
    aug_id = jnp.arange(8, dtype=jnp.int32)
    key = jax.random.key(7)

    # Single device (first CPU device only). Fresh state per topology:
    # the step donates its input state, which would invalidate a shared
    # source buffer.
    one = make_mesh(jax.devices()[:1])
    f1 = build_step_fn(cfg, model, sampler, perceptual, one)
    s1 = jax.device_put(
        create_state(cfg, model, jax.random.key(0)), replicated_sharding(one)
    )
    b1 = {
        "image": jax.device_put(jnp.asarray(img), batch_sharding(one)),
        "aug_id": jax.device_put(aug_id, batch_sharding(one)),
    }
    ns1, m1 = f1(s1, b1, key)

    # 8-device shard_map DP.
    mesh = make_mesh()
    assert mesh.size == 8
    f8 = build_step_fn(cfg, model, sampler, perceptual, mesh)
    s8 = jax.device_put(
        create_state(cfg, model, jax.random.key(0)), replicated_sharding(mesh)
    )
    b8 = {
        "image": jax.device_put(jnp.asarray(img), batch_sharding(mesh)),
        "aug_id": jax.device_put(aug_id, batch_sharding(mesh)),
    }
    ns8, m8 = f8(s8, b8, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=2e-4)
    l1 = jax.tree_util.tree_leaves(ns1.params)
    l8 = jax.tree_util.tree_leaves(ns8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=2e-4
        )


def test_loader_shards_cover_index_space_exactly_once():
    # SURVEY.md §4.3: per-host sharding covers the index space exactly once.
    ds = SyntheticBlobs(size=8, n_blobs=1, n_examples=24)
    seen = []
    for pidx in range(3):
        it = make_loader(
            ds, batch_size=4, shuffle=False, num_epochs=1,
            process_index=pidx, process_count=3,
        )
        for batch in it:
            seen.append(batch["image"])
    allimgs = np.concatenate(seen)
    assert allimgs.shape[0] == 24
    # All examples distinct => no index visited twice.
    flat = allimgs.reshape(24, -1)
    assert len(np.unique(flat.round(5), axis=0)) == 24


def test_config_overrides():
    cfg = apply_overrides(TINY, ["optim.lr=0.5", "model.n_parts=7", "steps=9"])
    assert cfg.optim.lr == 0.5
    assert cfg.model.n_parts == 7
    assert cfg.steps == 9


def test_smoke_train_loss_decreases(tmp_path):
    # SURVEY.md §4.4 (short CI version): a few steps must run end-to-end
    # through the real loop (loader, mesh, ckpt, logging) without NaNs.
    cfg = TINY.replace(steps=6, ckpt_dir=str(tmp_path / "run"), ckpt_every=5)
    state = train(cfg)
    assert int(state.step) == 6
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.all(np.isfinite(np.asarray(l, np.float32))) for l in leaves)

    # Resume: a fresh call restores from the checkpoint and continues.
    cfg2 = cfg.replace(steps=8)
    state2 = train(cfg2)
    assert int(state2.step) == 8


def test_smoke_train_warp_every_schedule(tmp_path):
    # Loop-level integration of the warp_every period program: train()
    # advances one period (2 sub-steps, 2 batches) per dispatch, stays
    # finite, checkpoints at period boundaries, and resumes aligned.
    import dataclasses

    cfg = TINY.replace(
        steps=4, ckpt_dir=str(tmp_path / "run"), ckpt_every=2,
        augment=dataclasses.replace(TINY.augment, warp_every=2),
    )
    state = train(cfg)
    assert int(state.step) == 4
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.all(np.isfinite(np.asarray(l, np.float32))) for l in leaves)
    # Resume from the period-aligned checkpoint and continue.
    state2 = train(cfg.replace(steps=6))
    assert int(state2.step) == 6
    # A step budget that isn't a period multiple is rejected loudly.
    with pytest.raises(ValueError, match="multiple of"):
        train(cfg.replace(steps=7, ckpt_dir=str(tmp_path / "run2")))


def test_data_echo_consumes_one_batch_per_group(tmp_path):
    # data_echo=2: each fetched batch feeds 2 optimizer steps (fresh
    # augmentation draws per echo — keys fold state.step). With an
    # explicit data_iter (no prefetch), exactly steps/E batches are
    # pulled.
    ds = SyntheticBlobs(size=16, n_blobs=3, n_examples=64)
    pulls = []

    def counting():
        for b in make_loader(ds, TINY.global_batch, seed=0):
            pulls.append(1)
            yield b

    cfg = TINY.replace(steps=4, ckpt_dir=str(tmp_path / "run"),
                       data_echo=2)
    state = train(cfg, data_iter=counting())
    assert int(state.step) == 4
    assert sum(pulls) == 2, pulls
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.all(np.isfinite(np.asarray(l, np.float32))) for l in leaves)
    # A step budget that isn't a multiple of the echo group is rejected.
    with pytest.raises(ValueError, match="multiple of"):
        train(cfg.replace(steps=5, ckpt_dir=str(tmp_path / "run2")))


def test_data_echo_resume_seeks_by_group(tmp_path, monkeypatch):
    # Resume under data_echo=2 must seek the loader to step // 2 so the
    # post-restore batch sequence matches the uninterrupted stream, and
    # checkpoints must only land on group-aligned steps.
    import partseg_tpu.train.loop as loop_mod

    starts = []
    real = loop_mod.make_loader

    def spy(*a, **kw):
        starts.append(kw.get("start_batch", 0))
        return real(*a, **kw)

    monkeypatch.setattr(loop_mod, "make_loader", spy)
    cfg = TINY.replace(steps=4, ckpt_dir=str(tmp_path / "run"),
                       ckpt_every=2, data_echo=2)
    train(cfg)
    state = train(cfg.replace(steps=8))
    assert int(state.step) == 8
    assert starts == [0, 2], starts


def test_host_local_rows_reassembles_space_shards():
    # _log_images support: under a ("data","space") mesh the image is
    # sharded in BOTH batch and row dims — _host_local_rows must stitch
    # row pieces back to full-height samples (an axis-0 concat would
    # log half-height images as separate samples).
    from jax.sharding import NamedSharding, PartitionSpec as P

    from partseg_tpu.dist.mesh import make_spatial_mesh
    from partseg_tpu.train.loop import _host_local_rows

    mesh = make_spatial_mesh(2)          # 4 data x 2 space on 8 devices
    x = np.arange(8 * 16 * 4 * 3, dtype=np.float32).reshape(8, 16, 4, 3)
    g = jax.device_put(x, NamedSharding(mesh, P("data", "space")))
    rows = _host_local_rows(g, 3)
    np.testing.assert_array_equal(rows, x[:3])
    # Replicated arrays (unsharded axes) must not be double-counted.
    r = jax.device_put(x, NamedSharding(mesh, P("data")))
    np.testing.assert_array_equal(_host_local_rows(r, 5), x[:5])


def test_registry_unknown_dataset():
    with pytest.raises(KeyError, match="synthetic"):
        build_dataset("nope")


def test_loader_start_batch_seeks_exactly():
    # SURVEY.md §5.4: the data-iterator "checkpoint" is the batch index;
    # a loader seeked to start_batch=k must reproduce batch k, k+1, ...
    # of the uninterrupted stream exactly (incl. across epoch bounds).
    ds = SyntheticBlobs(size=8, n_blobs=1, n_examples=40)
    full = [b["image"] for b, _ in zip(make_loader(ds, 4, seed=3), range(12))]
    res = [
        b["image"]
        for b, _ in zip(make_loader(ds, 4, seed=3, start_batch=5), range(7))
    ]
    assert len(full) == 12 and len(res) == 7
    for a, b in zip(full[5:], res):
        np.testing.assert_array_equal(a, b)


def test_resume_seeks_data_iterator(tmp_path, monkeypatch):
    # Resume must pass start_batch=restored_step into the loader, so the
    # post-restore batch sequence equals the uninterrupted one.
    import partseg_tpu.train.loop as loop_mod

    starts = []
    real = loop_mod.make_loader

    def spy(*a, **kw):
        starts.append(kw.get("start_batch", 0))
        return real(*a, **kw)

    monkeypatch.setattr(loop_mod, "make_loader", spy)
    cfg = TINY.replace(steps=4, ckpt_dir=str(tmp_path / "run"), ckpt_every=2)
    train(cfg)
    train(cfg.replace(steps=6))
    assert starts == [0, 4], starts


def test_pallas_step_under_shard_map():
    # The combination that runs on a real v5e-8: pallas_call inside the
    # shard_map DP step (interpret mode on the CPU backend, tiny shapes).
    # shard_map was chosen over pjit auto-sharding precisely because of
    # pallas_call, so this pairing needs first-class coverage.
    from partseg_tpu.train.loop import build_step_fn

    cfg = TINY.replace(
        model=PartNetConfig(n_parts=3, img_size=16, features=16, depth=1,
                            app_features=8, decoder_scales=2, use_pallas=True)
    )
    model = PartNet(cfg.model)
    mesh = make_mesh()
    assert mesh.size == 8
    step_fn = build_step_fn(
        cfg, model, cfg.augment.make_sampler(), build_perceptual(cfg), mesh
    )
    state = jax.device_put(
        create_state(cfg, model, jax.random.key(0)), replicated_sharding(mesh)
    )
    batch = {
        "image": jax.device_put(
            jnp.asarray(
                np.random.default_rng(0).uniform(0, 1, (8, 16, 16, 3)),
                jnp.float32,
            ),
            batch_sharding(mesh),
        ),
        "aug_id": jax.device_put(
            jnp.arange(8, dtype=jnp.int32), batch_sharding(mesh)
        ),
    }
    new_state, metrics = step_fn(state, batch, jax.random.key(7))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_train_loop_spatial_mesh(tmp_path):
    # End-to-end loop wiring for space_shards>1 (configs/celeba256_spatial
    # path scaled down): mesh construction, P("data","space") batch
    # placement, aug_id sharding, metrics — 3 steps on the CPU mesh.
    import dataclasses

    cfg = TINY.replace(
        model=dataclasses.replace(TINY.model, img_size=32),
        augment=AugmentConfig(tps_grid=3, warp_impl="gather"),
        dataset_kwargs=(("size", 32), ("n_blobs", 3), ("n_examples", 64)),
        space_shards=2,
        ckpt_dir=str(tmp_path / "run"),
    )
    state = train(cfg, restore=False)
    import json
    import pathlib

    hist = [
        json.loads(l) for l in
        pathlib.Path(cfg.ckpt_dir, "metrics.jsonl").read_text().splitlines()
    ]
    assert len(hist) == 3 and np.isfinite(hist[-1]["loss"])
    assert np.isfinite(
        np.asarray(jax.tree.leaves(state.params)[0], np.float32)
    ).all()


def test_warp_every_period_program():
    # augment.warp_every=2: build_step_fn returns ONE unrolled period
    # program (warp_period attr) taking a tuple of 2 batches. The
    # warp-on sub-step matches the warp_every=1 step exactly; the
    # warp-off sub-step still trains (finite, measurably different
    # loss); the whole period equals running the two sub-step graphs
    # sequentially.
    import dataclasses

    from partseg_tpu.dist.mesh import make_mesh
    from partseg_tpu.train.loop import build_perceptual, build_step_fn
    from partseg_tpu.train.step import make_train_step

    cfg1 = TINY
    cfg2 = dataclasses.replace(
        TINY, augment=dataclasses.replace(TINY.augment, warp_every=2)
    )
    img = np.random.default_rng(3).uniform(0, 1, (8, 16, 16, 3)).astype(np.float32)
    key = jax.random.key(5)
    one = make_mesh(jax.devices()[:1])

    def build(cfg):
        model = PartNet(cfg.model)
        state = create_state(cfg, model, jax.random.key(0))
        fn = build_step_fn(
            cfg, model, cfg.augment.make_sampler(), build_perceptual(cfg), one
        )
        return model, state, fn

    _, s1, f1 = build(cfg1)
    model2, s2, f2 = build(cfg2)
    assert getattr(f1, "warp_period", 1) == 1
    assert f2.warp_period == 2
    # donate_argnums=0: give each call its own batch dict.
    b = lambda: {"image": jnp.asarray(img)}
    s1_a, m1 = f1(s1, b(), key)
    s2_end, m2 = f2(s2, (b(), b()), key)
    # Sub-step 0 is a warp step: the SAME graph semantics as f1's step.
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss_warp_on"]), rtol=1e-5
    )
    # Sub-step 1 runs warp-free: finite, measurably different from the
    # warped step f1 takes from the same mid-period state.
    _, m1b = f1(s1_a, b(), key)
    assert np.isfinite(float(m2["loss_warp_off"]))
    assert abs(float(m2["loss_warp_off"]) - float(m1b["loss"])) > 0
    leaves = jax.tree.leaves(s2_end.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

    # The unrolled program == its sub-step graphs run sequentially.
    perceptual = build_perceptual(cfg2)
    sampler = cfg2.augment.make_sampler()
    f_on = jax.jit(make_train_step(cfg2, model2, sampler, perceptual,
                                   warp_on=True))
    f_off = jax.jit(make_train_step(cfg2, model2, sampler, perceptual,
                                    warp_on=False))
    s_ref = create_state(cfg2, model2, jax.random.key(0))
    s_ref, _ = f_on(s_ref, b(), key)
    s_ref, _ = f_off(s_ref, b(), key)
    for a, r in zip(jax.tree.leaves(s2_end.params), jax.tree.leaves(s_ref.params)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(r, np.float32),
            rtol=2e-4, atol=2e-6,
        )


def test_scan_groups_loop_exact(tmp_path):
    # cfg.scan_groups=2: the loop dispatches lax.scan over 2 stacked
    # fetch groups (one host transfer per sub-slot). Must execute the
    # SAME STEP SEQUENCE as scan_groups=1 over the same data stream
    # (same batches, same step-folded keys, same update order), consume
    # the same number of loader batches, and reject misaligned budgets.
    #
    # What "same" means numerically: the scan body and the per-period
    # program are DIFFERENT XLA executables, so raw params carry
    # cross-executable roundoff that Adam amplifies up to O(lr·steps)
    # on near-zero-gradient leaves (measured: the stem Conv biases —
    # they feed a norm, grads ~0, the update is pure m/√v noise; drift
    # ~1e-3 ≈ Σlr over 8 warmup steps). The step-sequence claim is
    # therefore pinned on the LOSS TRAJECTORY (metrics.jsonl, ~1e-5
    # agreement in f32) and the data stream; params are compared with
    # an atol that covers the Adam-noise floor.
    import dataclasses
    import json

    ds_kw = dict(size=16, n_blobs=3, n_examples=64)
    f32_model = dataclasses.replace(TINY.model, dtype=jnp.float32)
    ADAM_NOISE_ATOL = 4e-3     # > Σ_s lr(s) over 8 warmup steps (3.6e-3)

    def run(scan, steps=8, echo=1, tag=""):
        ds = SyntheticBlobs(**ds_kw)
        pulls = []

        def counting():
            for b in make_loader(ds, TINY.global_batch, seed=0):
                pulls.append(1)
                yield b

        run_dir = tmp_path / f"run{scan}{echo}{tag}"
        cfg = TINY.replace(
            model=f32_model,
            steps=steps, ckpt_dir=str(run_dir),
            # ckpt_every must be a multiple of the dispatch span
            # warp_every*data_echo*scan_groups (8 for the echo legs).
            ckpt_every=8, scan_groups=scan, data_echo=echo,
            augment=dataclasses.replace(TINY.augment, warp_every=2),
        )
        state = train(cfg, data_iter=counting())
        losses = {}
        for line in (run_dir / "metrics.jsonl").read_text().splitlines():
            rec = json.loads(line)
            losses[int(rec["step"])] = rec["loss"]
        return state, sum(pulls), losses

    def assert_params_close(a_state, r_state):
        for a, r in zip(jax.tree.leaves(a_state.params),
                        jax.tree.leaves(r_state.params)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(r, np.float32),
                rtol=2e-4, atol=ADAM_NOISE_ATOL,
            )

    s_scan, pulls_scan, l_scan = run(scan=2)
    s_seq, pulls_seq, l_seq = run(scan=1)
    assert pulls_scan == pulls_seq == 8  # steps batches (echo=1)
    assert int(s_scan.step) == int(s_seq.step) == 8
    # Step-sequence identity: each scan dispatch's mean loss equals the
    # mean of the sequential run's two period means over the same steps.
    assert sorted(l_scan) == [0, 4] and sorted(l_seq) == [0, 2, 4, 6]
    for s in (0, 4):
        np.testing.assert_allclose(
            l_scan[s], (l_seq[s] + l_seq[s + 2]) / 2, rtol=1e-5,
            err_msg=f"dispatch at step {s}",
        )
    assert_params_close(s_scan, s_seq)

    # data_echo composes: echo moves on-device (compose_scan), fetch
    # count and the loss trajectory still match the echoed sequential
    # loop (span = warp_every*echo*scan = 8 → one dispatch, one log).
    s_scan_e, pulls_scan_e, le_scan = run(scan=2, echo=2, tag="e")
    s_seq_e, pulls_seq_e, le_seq = run(scan=1, echo=2, tag="e")
    assert pulls_scan_e == pulls_seq_e == 4  # steps/echo batches
    assert sorted(le_scan) == [0] and sorted(le_seq) == [0, 2, 4, 6]
    np.testing.assert_allclose(
        le_scan[0], np.mean([le_seq[s] for s in (0, 2, 4, 6)]), rtol=1e-5,
    )
    assert_params_close(s_scan_e, s_seq_e)

    # Budgets not aligned to warp_every*data_echo*scan_groups fail loud.
    import dataclasses as dc

    bad = TINY.replace(
        steps=6, ckpt_dir=str(tmp_path / "bad"), ckpt_every=4,
        scan_groups=2,
        augment=dc.replace(TINY.augment, warp_every=2),
    )
    with pytest.raises(ValueError, match="align"):
        train(bad)


def test_device_data_loop_exact(tmp_path):
    # cfg.device_data: the whole dataset lives in device HBM and the
    # jitted step gathers images by index — the per-dispatch transfer is
    # B int32s. Must train on the SAME batch/step sequence as the
    # streaming loop: the gather returns bit-identical image rows, so
    # the loss trajectory matches (the executable differs — gather
    # fused in — so params carry the same cross-executable-roundoff
    # class scan_groups documents; see test_scan_groups_loop_exact).
    import dataclasses
    import json

    f32_model = dataclasses.replace(TINY.model, dtype=jnp.float32)
    ADAM_NOISE_ATOL = 4e-3

    def run(device_data, scan=1, tag=""):
        run_dir = tmp_path / f"run{int(device_data)}{scan}{tag}"
        cfg = TINY.replace(
            model=f32_model,
            steps=8, ckpt_dir=str(run_dir), ckpt_every=8,
            scan_groups=scan, device_data=device_data,
            augment=dataclasses.replace(TINY.augment, warp_every=2),
        )
        state = train(cfg)
        losses = {}
        for line in (run_dir / "metrics.jsonl").read_text().splitlines():
            rec = json.loads(line)
            losses[int(rec["step"])] = rec["loss"]
        return state, losses

    s_dev, l_dev = run(True)
    s_str, l_str = run(False)
    assert int(s_dev.step) == int(s_str.step) == 8
    assert sorted(l_dev) == sorted(l_str)
    for s in l_str:
        np.testing.assert_allclose(l_dev[s], l_str[s], rtol=1e-5,
                                   err_msg=f"step {s}")
    for a, r in zip(jax.tree.leaves(s_dev.params),
                    jax.tree.leaves(s_str.params)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(r, np.float32),
            rtol=2e-4, atol=ADAM_NOISE_ATOL,
        )

    # Composes with scan_groups (indices stack on the scan axis and the
    # gather runs inside the scan body).
    s_dev_s, l_dev_s = run(True, scan=2, tag="s")
    assert int(s_dev_s.step) == 8
    for s in l_dev_s:
        covered = [x for x in sorted(l_str) if s <= x < s + 4]
        np.testing.assert_allclose(
            l_dev_s[s], np.mean([l_str[x] for x in covered]), rtol=1e-5,
            err_msg=f"scan dispatch at step {s}",
        )

    # Unsupported compositions fail loudly.
    with pytest.raises(ValueError, match="device_data"):
        train(TINY.replace(device_data=True, loader_backend="native",
                           ckpt_dir=str(tmp_path / "bad1")))
    with pytest.raises(ValueError, match="device_data"):
        train(TINY.replace(device_data=True, ckpt_dir=str(tmp_path / "bad2")),
              data_iter=iter([]))


def test_device_data_u8_loop_exact(tmp_path, monkeypatch):
    # cfg.device_data_u8: the HBM table stores round(x*255) uint8 — the
    # identical representation a JPEG-decoding u8 host loader ships, at
    # 4× the capacity of the f32 table (VERDICT r4 weak #5). Reference:
    # the STREAMING loop over the same dataset pre-quantized to u8 on
    # host — same image bits through the step's same uint8-normalize
    # path, so the loss trajectory matches; params carry the usual
    # cross-executable Adam roundoff (see test_device_data_loop_exact).
    import dataclasses
    import json

    from partseg_tpu.train import loop as loop_mod

    f32_model = dataclasses.replace(TINY.model, dtype=jnp.float32)
    ADAM_NOISE_ATOL = 4e-3

    class _U8Dataset:
        def __init__(self, ds):
            self._ds = ds

        def __len__(self):
            return len(self._ds)

        def __getitem__(self, idx):
            ex = dict(self._ds[idx])
            ex["image"] = np.clip(
                np.round(np.asarray(ex["image"]) * 255.0), 0, 255
            ).astype(np.uint8)
            return ex

    real_build = loop_mod.build_dataset

    def run(tag, table_u8):
        if table_u8:
            monkeypatch.setattr(loop_mod, "build_dataset", real_build)
        else:  # streaming reference feeds host-quantized u8 batches
            monkeypatch.setattr(
                loop_mod, "build_dataset",
                lambda *a, **k: _U8Dataset(real_build(*a, **k)),
            )
        run_dir = tmp_path / tag
        cfg = TINY.replace(
            model=f32_model, steps=6, ckpt_dir=str(run_dir), ckpt_every=6,
            device_data=table_u8, device_data_u8=table_u8,
        )
        state = train(cfg)
        losses = {}
        for line in (run_dir / "metrics.jsonl").read_text().splitlines():
            rec = json.loads(line)
            losses[int(rec["step"])] = rec["loss"]
        return state, losses

    s_u8, l_u8 = run("table_u8", True)
    s_ref, l_ref = run("stream_u8", False)
    assert int(s_u8.step) == int(s_ref.step) == 6
    assert sorted(l_u8) == sorted(l_ref)
    for s in l_ref:
        np.testing.assert_allclose(l_u8[s], l_ref[s], rtol=1e-5,
                                   err_msg=f"step {s}")
    for a, r in zip(jax.tree.leaves(s_u8.params),
                    jax.tree.leaves(s_ref.params)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(r, np.float32),
            rtol=2e-4, atol=ADAM_NOISE_ATOL,
        )
