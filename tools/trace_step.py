"""Capture a profiler trace of the train step and print the top ops.

Writes /tmp/partseg_trace, then parses the perfetto trace.json.gz and
aggregates device-op durations by fusion/op name.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from partseg_tpu.augment.pair import AugmentConfig
    from partseg_tpu.dist.mesh import make_mesh
    from partseg_tpu.models.partnet import PartNet, PartNetConfig
    from partseg_tpu.train.config import LossConfig, OptimConfig, TrainConfig
    from partseg_tpu.train.loop import build_perceptual, build_step_fn
    from partseg_tpu.train.state import create_state

    B = int(os.environ.get("TRACE_BATCH", "64"))
    cfg = TrainConfig(
        model=PartNetConfig(n_parts=10, img_size=128),
        augment=AugmentConfig(),
        loss=LossConfig(),
        optim=OptimConfig(),
        global_batch=B,
    )
    mesh = make_mesh()
    model = PartNet(cfg.model)
    state = create_state(cfg, model, jax.random.key(0))
    step_fn = build_step_fn(cfg, model, cfg.augment.make_sampler(),
                            build_perceptual(cfg), mesh)
    batch = {
        "image": jax.random.uniform(jax.random.key(1), (B, 128, 128, 3)),
        "aug_id": jnp.arange(B, dtype=jnp.int32),
    }
    key = jax.random.key(2)
    state, m = step_fn(state, batch, key)
    jax.block_until_ready(state.params)

    trace_dir = "/tmp/partseg_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            state, m = step_fn(state, batch, key)
        jax.block_until_ready(state.params)

    # Parse the chrome trace.
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace written under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)

    # Device-side complete events; exclude host threads by pid name.
    pid_names = {}
    for ev in data["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items() if "TPU" in n or "tpu" in n}

    agg = defaultdict(float)
    total = 0.0
    for ev in data["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        agg[name] += dur
        total += dur
    print(f"total device time over 3 steps: {total:.1f} ms "
          f"({total/3:.1f} ms/step)")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{dur/3:9.3f} ms/step  {100*dur/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
