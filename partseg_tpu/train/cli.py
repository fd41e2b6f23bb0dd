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
    args = ap.parse_args(argv)

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


if __name__ == "__main__":
    main()
