"""Inference/serving throughput bench (img/s/chip).

The training bench (bench.py) is the headline; this measures the
SERVING surface: the shape-encoder inference forward — part heatmaps,
soft-argmax landmarks, dense segmentation (SURVEY.md §3.2, the
reference's notebook API) — as exported for production by
evals/export.py. Two paths, same forward:

  jit      — the in-process jitted forward (a Python service embedding
             partseg_tpu),
  exported — serialize → deserialize → call, i.e. exactly what a
             serving binary that loads the StableHLO artifact executes.

Prints one JSON line per path. CAVEAT (measured, 2026-08-18): through
the axon tunnel these wall-clock numbers are DISPATCH-bound and drift
with loop length (164k at --steps 30 vs 345k at --steps 300 for the
same speed128 forward) — CLAUDE.md's small-jit warning applies. The
authoritative capacity numbers come from profiler traces of the same
forward (docs/perf_ledger.md serving section): 0.64 ms / 256 imgs
(speed128 encoder) and 8.8 ms / 256 (flagship) of device-op time. On
a production host (local PCIe) wall-clock converges to those.

Run: python tools/bench_infer.py [--config configs/speed128.py]
     [--batch 256] [--ckpt_dir ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/speed128.py")
    ap.add_argument("--ckpt_dir", default=None)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from partseg_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from partseg_tpu.evals.export import export_infer, make_infer_fn
    from partseg_tpu.evals.infer import load_model_and_params
    from partseg_tpu.train.config import load_config

    cfg = load_config(args.config)
    # Serving decodes at full resolution regardless of the training
    # recipe's decoder_out_size (the decoder is fully convolutional and
    # unused by the shape-only inference forward anyway).
    model, params = load_model_and_params(cfg, args.ckpt_dir)
    s = cfg.model.img_size
    x = jax.device_put(
        jax.random.uniform(jax.random.key(0), (args.batch, s, s, 3),
                           jnp.float32)
    )

    def measure(call):
        for _ in range(args.warmup):
            jax.block_until_ready(call(x))
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = call(x)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        return args.batch * args.steps / dt

    jit_fn = jax.jit(make_infer_fn(model, params))
    rate_jit = measure(jit_fn)
    print(json.dumps({
        "metric": "infer_throughput", "path": "jit",
        "value": round(rate_jit, 1), "unit": "img/s/chip",
        "batch": args.batch, "img_size": s, "config": args.config,
    }))

    platform = "cpu" if args.cpu else jax.default_backend()
    exported = export_infer(model, params, s, batch=args.batch,
                            platforms=(platform if platform != "cpu"
                                       else "cpu",))
    reloaded = jax.export.deserialize(bytearray(exported.serialize()))
    rate_exp = measure(jax.jit(reloaded.call))
    print(json.dumps({
        "metric": "infer_throughput", "path": "exported",
        "value": round(rate_exp, 1), "unit": "img/s/chip",
        "batch": args.batch, "img_size": s, "config": args.config,
    }))


if __name__ == "__main__":
    main()
