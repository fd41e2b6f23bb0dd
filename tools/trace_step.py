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
    if os.environ.get("TRACE_CONFIG"):
        from partseg_tpu.train.config import load_config

        cfg = load_config(os.environ["TRACE_CONFIG"]).replace(global_batch=B)
    else:
        cfg = TrainConfig(
            model=PartNetConfig(n_parts=10, img_size=128),
            augment=AugmentConfig(),
            loss=LossConfig(),
            optim=OptimConfig(),
            global_batch=B,
        )
    if os.environ.get("TRACE_SET"):
        from partseg_tpu.train.config import apply_overrides

        cfg = apply_overrides(cfg, os.environ["TRACE_SET"].split())
    mesh = make_mesh()
    model = PartNet(cfg.model)
    state = create_state(cfg, model, jax.random.key(0))
    step_fn = build_step_fn(cfg, model, cfg.augment.make_sampler(),
                            build_perceptual(cfg), mesh)
    px = cfg.model.img_size
    batch = {
        "image": jax.random.uniform(jax.random.key(1), (B, px, px, 3)),
        "aug_id": jnp.arange(B, dtype=jnp.int32),
    }
    key = jax.random.key(2)
    # warp_every>1 configs: one dispatch = one unrolled period program
    # over `wp` batches; the breakdown divides by SUB-steps so numbers
    # stay per-optimizer-step.
    wp = getattr(step_fn, "warp_period", 1)
    b = batch if wp == 1 else (batch,) * wp

    state, m = step_fn(state, b, key)
    jax.block_until_ready(state.params)

    n_disp = 3 if wp == 1 else 2
    trace_dir = "/tmp/partseg_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(n_disp):
            state, m = step_fn(state, b, key)
        jax.block_until_ready(state.params)

    print_trace_breakdown(trace_dir, n_steps=n_disp * wp)


def print_trace_breakdown(trace_dir: str, n_steps: float) -> None:
    """Aggregate the device 'XLA Ops' thread (leaf ops only — the
    'Steps'/'XLA Modules' threads are containers that double-count)."""
    import re

    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace written under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)

    tid_names = {}
    for ev in data["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")

    agg = defaultdict(lambda: [0.0, 0.0, 0.0, ""])  # dur, bytes, flops, long
    cat = defaultdict(float)
    total = 0.0
    for ev in data["traceEvents"]:
        if ev.get("ph") != "X":
            continue
        if tid_names.get((ev["pid"], ev.get("tid"))) != "XLA Ops":
            continue
        name = ev.get("name", "?")
        args = ev.get("args", {})
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        a = agg[name]
        a[0] += dur
        a[1] += float(args.get("bytes_accessed", 0) or 0)
        a[2] += float(args.get("model_flops", 0) or 0)
        a[3] = args.get("long_name", "")[:180]
        total += dur
        # The profiler's own HLO category is the most faithful rollup.
        cat[args.get("hlo_category", re.sub(r"[.\d]+$", "", name))] += dur
    print(f"total XLA-op time: {total:.1f} ms ({total/n_steps:.1f} ms/step)")
    print("== hlo categories ==")
    for name, dur in sorted(cat.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{dur/n_steps:9.3f} ms/step {100*dur/total:5.1f}%  {name}")
    print("== top individual ops (GB/s = HBM pressure, TF/s = MXU use) ==")
    for name, (dur, byt, fl, long) in sorted(
        agg.items(), key=lambda kv: -kv[1][0]
    )[:30]:
        gbs = byt / (dur * 1e6) if dur else 0.0        # bytes/ms → GB/s
        tfs = fl / (dur * 1e9) if dur else 0.0         # flops/ms → TF/s
        print(f"{dur/n_steps:9.3f} ms/step {100*dur/total:5.1f}% "
              f"{gbs:6.0f} GB/s {tfs:6.1f} TF/s  {name[:36]:36s} {long[:90]}")


if __name__ == "__main__":
    main()
