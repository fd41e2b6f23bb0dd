"""CLI: ``python -m partseg_tpu.train.cli --config configs/celeba.py [-t]``.

Mirrors the reference's ``edflow -b config.yaml -t [-p project] [-c
ckpt]`` entry point (SURVEY.md §3.1): config file + dot-path overrides,
restore-latest by default.
"""

from __future__ import annotations

import argparse

from partseg_tpu.dist.mesh import init_distributed
from partseg_tpu.train.config import apply_overrides, load_config
from partseg_tpu.train.loop import train


def main(argv=None):
    ap = argparse.ArgumentParser(description="partseg_tpu trainer")
    ap.add_argument("--config", "-b", required=True, help="python config file")
    ap.add_argument("--set", nargs="*", default=[], metavar="KEY=VAL",
                    help="dot-path overrides, e.g. optim.lr=3e-4")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--ckpt_dir", "-p", default=None, help="run/project dir")
    ap.add_argument("--no-restore", action="store_true")
    ap.add_argument("--coordinator", default=None, help="multi-host DCN address")
    ap.add_argument("--debug_nans", action="store_true",
                    help="enable jax nan-debugging (SURVEY.md §5.2)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu) — env vars are "
                         "overridden by the environment's sitecustomize")
    ap.add_argument("--check_data", action="store_true",
                    help="validate the config's dataset layout under "
                         "$PARTSEG_DATA (docs/real_data.md) and exit")
    ap.add_argument("--segment_steps", type=int, default=None,
                    help="train in fresh-process segments of N steps via "
                         "the restore-latest resume path (numerics are "
                         "exactness-tested identical). Bounds per-process "
                         "host growth: some device transports leak their "
                         "staging buffer on every host->device transfer "
                         "(docs/perf_ledger.md r4), which degrades long "
                         "single-process runs. Requires --steps and "
                         "--ckpt_dir.")
    args = ap.parse_args(argv)

    if args.segment_steps:
        # The driver process must NOT import/initialize jax: the device
        # belongs to one process at a time, and the whole point is that
        # each segment runs in a fresh process.
        return _run_segmented(args)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from partseg_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = load_config(args.config)
    cfg = apply_overrides(cfg, args.set)
    if args.check_data:
        import sys

        from partseg_tpu.data.check import check_data

        sys.exit(0 if check_data(cfg.dataset, dict(cfg.dataset_kwargs)) else 1)
    init_distributed(args.coordinator)
    if args.steps is not None:
        cfg = cfg.replace(steps=args.steps)
    if args.ckpt_dir is not None:
        cfg = cfg.replace(ckpt_dir=args.ckpt_dir)
    train(cfg, restore=not args.no_restore)


def _latest_ckpt_step(ckpt_dir: str) -> int:
    import pathlib

    d = pathlib.Path(ckpt_dir, "checkpoints")
    if not d.is_dir():
        return 0
    return max((int(p.name) for p in d.iterdir() if p.name.isdigit()),
               default=0)


def _run_segmented(args) -> None:
    """Spawn one child CLI process per segment; each child restores the
    latest checkpoint, trains segment_steps further, and exits (returning
    all per-process host memory to the OS). Resume is the exactness-
    tested seek path, so the trained numerics equal one long run."""
    import subprocess
    import sys

    if args.steps is None or args.ckpt_dir is None:
        raise SystemExit("--segment_steps requires --steps and --ckpt_dir")
    if args.no_restore and _latest_ckpt_step(args.ckpt_dir) > 0:
        # A fresh segmented run over old checkpoints would train segment
        # 1 from scratch but then "resume" the STALE higher-step
        # checkpoint for segment 2 (Orbax also refuses interval saves
        # below the existing step). Refuse instead of silently mixing
        # runs.
        raise SystemExit(
            f"--no-restore with --segment_steps requires a clean run dir, "
            f"but {args.ckpt_dir} already has a checkpoint at step "
            f"{_latest_ckpt_step(args.ckpt_dir)}; delete it or drop "
            "--no-restore"
        )
    cur = 0 if args.no_restore else _latest_ckpt_step(args.ckpt_dir)
    first = True
    while cur < args.steps:
        target = min(cur + args.segment_steps, args.steps)
        cmd = [sys.executable, "-m", "partseg_tpu.train.cli",
               "--config", args.config,
               "--steps", str(target), "--ckpt_dir", args.ckpt_dir]
        if args.set:
            cmd += ["--set", *args.set]
        if args.platform:
            cmd += ["--platform", args.platform]
        if args.debug_nans:
            cmd += ["--debug_nans"]
        if args.coordinator:
            cmd += ["--coordinator", args.coordinator]
        if first and args.no_restore:
            cmd += ["--no-restore"]
        print(f"[segment] steps {cur} -> {target}", flush=True)
        r = subprocess.run(cmd)
        if r.returncode != 0:
            raise SystemExit(r.returncode)
        done = _latest_ckpt_step(args.ckpt_dir)
        if done < target:
            raise SystemExit(
                f"segment made no checkpoint progress ({cur} -> {done}, "
                f"wanted {target})"
            )
        cur = done
        first = False


if __name__ == "__main__":
    main()
