"""Fault-injection + resume test (SURVEY.md §5.3): kill the trainer
mid-run via --set fault_injection_step, then verify a rerun restores
the checkpoint and finishes. Runs the trainer as a subprocess (the real
CLI surface) on the CPU backend with a tiny config."""

import json
import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def _run_cli(args, env):
    return subprocess.run(
        [sys.executable, "-m", "partseg_tpu.train.cli", *args],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=2400,
    )


@pytest.mark.slow
def test_fault_injection_then_resume(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    run_dir = str(tmp_path / "run")
    sets = [
        "model.img_size=16", "model.features=16", "model.depth=1",
        "model.app_features=8", "model.decoder_scales=2", "model.n_parts=3",
        "model.use_pallas=False",
        "dataset_kwargs=(('size',16),('n_blobs',3),('n_examples',64))",
        "global_batch=8", "ckpt_every=5", "log_every=5", "image_log_every=0",
        "loss.vgg_layers=('relu1_2',)", "loss.vgg_trim_blocks=1",
    ]
    # --platform cpu: subprocesses don't run the test conftest, and the
    # environment's sitecustomize overrides JAX_PLATFORMS.
    common = ["--config", "configs/synthetic.py", "--ckpt_dir", run_dir,
              "--platform", "cpu", "--steps", "20"]

    # Run 1: inject a hard kill at step 12 (after the step-10 ckpt).
    r1 = _run_cli(common + ["--set"] + sets + ["fault_injection_step=12"], env)
    assert r1.returncode == 42, (r1.returncode, r1.stdout[-2000:], r1.stderr[-2000:])
    assert (pathlib.Path(run_dir) / "checkpoints").exists()

    # Run 2: must restore and complete all 20 steps.
    r2 = _run_cli(common + ["--set"] + sets, env)
    assert r2.returncode == 0, (r2.stdout[-2000:], r2.stderr[-2000:])
    assert "restored checkpoint" in r2.stdout
    steps = [
        json.loads(l)["step"]
        for l in (pathlib.Path(run_dir) / "metrics.jsonl").read_text().splitlines()
    ]
    assert max(steps) == 19


def test_segmented_no_restore_refuses_stale_checkpoints(tmp_path):
    # cli._run_segmented: a "fresh" segmented run over a dir that
    # already has checkpoints would silently mix runs (segment 2 would
    # restore the STALE higher-step checkpoint) — it must refuse before
    # touching jax. Pure-python path, no training.
    from partseg_tpu.train import cli

    run = tmp_path / "run"
    (run / "checkpoints" / "600").mkdir(parents=True)
    with pytest.raises(SystemExit, match="clean run dir"):
        cli.main([
            "--config", "configs/synthetic.py", "--ckpt_dir", str(run),
            "--steps", "1200", "--segment_steps", "600", "--no-restore",
        ])
