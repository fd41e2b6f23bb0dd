"""Two-phase NaN hunt for the synthetic training collapse.

Phase 1 (TPU):  python tools/nan_bisect.py tpu
    trains synthetic with ckpt_every=10 until past the NaN onset.
Phase 2 (CPU):  python tools/nan_bisect.py cpu
    finds the last finite step from metrics.jsonl, restores that
    checkpoint on the CPU backend with jax_debug_nans enabled (works
    there, unlike axon), and steps until the faulting primitive raises.
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUN = "logs/nan_bisect"


def phase_tpu():
    from partseg_tpu.train.config import load_config
    from partseg_tpu.train.loop import train

    cfg = load_config("configs/synthetic.py").replace(
        steps=260, ckpt_dir=RUN, ckpt_every=10, ckpt_keep=40,
        log_every=10, image_log_every=0,
    )
    train(cfg, restore=False)


def phase_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_debug_nans", True)

    import numpy as np

    from partseg_tpu.data.loader import make_loader
    from partseg_tpu.data.registry import build_dataset
    from partseg_tpu.dist.mesh import make_mesh
    from partseg_tpu.models.partnet import PartNet
    from partseg_tpu.train.checkpoint import CheckpointManager
    from partseg_tpu.train.config import load_config
    from partseg_tpu.train.loop import build_perceptual, build_step_fn
    from partseg_tpu.train.state import create_state

    cfg = load_config("configs/synthetic.py").replace(
        steps=260, ckpt_dir=RUN, ckpt_every=10, log_every=10
    )
    hist = [
        json.loads(l)
        for l in pathlib.Path(RUN, "metrics.jsonl").read_text().splitlines()
    ]
    bad = next(h["step"] for h in hist if not np.isfinite(h["loss"]))
    start = (bad // 10 - 1) * 10  # one checkpoint before the bad window
    print(f"first NaN logged at step {bad}; restoring step {start}")

    model = PartNet(cfg.model)
    state = create_state(cfg, model, jax.random.key(cfg.seed))
    mgr = CheckpointManager(RUN, save_every=10)
    restored = mgr._mgr.restore(
        start, args=__import__("orbax.checkpoint", fromlist=["args"]).args.StandardRestore(state)
    )
    state = restored
    mgr.close()

    mesh = make_mesh(jax.devices()[:1])
    step_fn = build_step_fn(
        cfg, model, cfg.augment.make_sampler(), build_perceptual(cfg), mesh
    )
    if getattr(step_fn, "warp_period", 1) > 1:
        raise SystemExit(
            "nan_bisect needs per-step granularity; rerun with "
            "augment.warp_every=1 (the sub-step graphs are identical, "
            "only the schedule differs)"
        )
    ds = build_dataset(cfg.dataset, split="train", **dict(cfg.dataset_kwargs))
    it = make_loader(ds, cfg.global_batch, seed=cfg.seed, num_workers=1)
    # Fast-forward the data stream to the restored step.
    for _ in range(start):
        next(it)
    key = jax.random.key(cfg.seed + 1)
    for step in range(start, bad + 12):
        batch = next(it)
        aug_id = np.arange(cfg.global_batch, dtype=np.int32) + step * cfg.global_batch
        try:
            b = {"image": batch["image"], "aug_id": aug_id}
            state, metrics = step_fn(state, b, key)
            loss = float(metrics["loss"])
            print(f"step {step}: loss {loss:.5f}", flush=True)
        except FloatingPointError as e:
            print(f"\n=== NaN raised at step {step} ===\n{e}")
            raise


if __name__ == "__main__":
    {"tpu": phase_tpu, "cpu": phase_cpu}[sys.argv[1]]()
