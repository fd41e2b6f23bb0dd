"""Two-process DCN tests (SURVEY.md §3.5, §5.8): jax.distributed over a
localhost coordinator, per-host batch assembly via _globalize, one
shard_map DP train step across 2 CPU processes (4 virtual devices each)
— the loss must match the single-process 8-device run exactly."""

import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
CHILD = REPO / "tests" / "_multihost_child.py"


def _run_pair(tmp_path, port):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(CHILD), str(i), "2", str(port), str(tmp_path)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    return [
        float((tmp_path / f"loss_{i}.txt").read_text()) for i in range(2)
    ]


@pytest.mark.slow
def test_two_process_dp_matches_single_process(tmp_path):
    port = 12400 + os.getpid() % 2000
    losses = _run_pair(tmp_path, port)
    # Both processes see the pmean'd loss → identical.
    assert losses[0] == losses[1], losses

    # Reference: the same global batch through the same step on THIS
    # process's 8 local devices (conftest backend).
    import jax

    from partseg_tpu.augment.pair import AugmentConfig
    from partseg_tpu.dist.mesh import (
        batch_sharding,
        create_replicated,
        make_mesh,
    )
    from partseg_tpu.models.partnet import PartNet, PartNetConfig
    from partseg_tpu.train.config import LossConfig, OptimConfig, TrainConfig
    from partseg_tpu.train.loop import build_perceptual, build_step_fn
    from partseg_tpu.train.state import create_state

    cfg = TrainConfig(
        model=PartNetConfig(n_parts=3, img_size=16, features=16, depth=1,
                            app_features=8, decoder_scales=2,
                            use_pallas=False),
        augment=AugmentConfig(tps_grid=3),
        loss=LossConfig(vgg_layers=("relu1_2",), vgg_trim_blocks=1),
        optim=OptimConfig(warmup_steps=2, decay_steps=10),
        global_batch=8,
    )
    model = PartNet(cfg.model)
    mesh = make_mesh()
    state = create_replicated(
        lambda: create_state(cfg, model, jax.random.key(0)), mesh
    )
    gids = np.arange(8, dtype=np.int32)
    imgs = np.stack([
        np.random.default_rng(int(g)).uniform(0, 1, (16, 16, 3)).astype(np.float32)
        for g in gids
    ])
    bsh = batch_sharding(mesh)
    batch = {
        "image": jax.device_put(imgs, bsh),
        "aug_id": jax.device_put(gids, bsh),
    }
    step_fn = build_step_fn(
        cfg, model, cfg.augment.make_sampler(), build_perceptual(cfg), mesh
    )
    _, metrics = step_fn(state, batch, jax.random.key(7))
    ref = float(metrics["loss"])
    np.testing.assert_allclose(losses[0], ref, rtol=2e-4)
