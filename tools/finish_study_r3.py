"""Finish/evaluate the r3 quality study from on-disk artifacts.

The 4-variant study process was OOM-killed mid-way through the last
variant's training (the per-variant dataset caches + sequential jit
executables of four models in ONE process peaked past the sandbox's
RAM). Training state is durable (Orbax checkpoints + metrics.jsonl per
variant), so this tool:

  1. resumes any variant whose checkpoint is behind its step budget
     (in a SUBPROCESS per variant, so memory is returned to the OS),
  2. recomputes the landmark + segmentation eval for every variant
     from its final checkpoint,
  3. assembles the same gate JSON quality_study.main_128 prints.

Run: python tools/finish_study_r3.py [--base_dir logs/quality_study_r3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.quality_study import PX128_BASE, VARIANTS_128

RATES = {"speed128_d64": 4304.0, "speed128_r3": 7322.3}


def variant_cfg(name):
    from partseg_tpu.train.config import apply_overrides, load_config

    ov, _ = VARIANTS_128[name]
    return apply_overrides(load_config("configs/synthetic.py"),
                           PX128_BASE + list(ov))


def resume_variant(name, steps, base_dir):
    """Run the remaining training steps in a fresh subprocess via the
    real CLI (restore-latest + iterator seek are the tested resume
    path)."""
    ov, _ = VARIANTS_128[name]
    out_dir = os.path.join(base_dir, name)
    args = [
        sys.executable, "-m", "partseg_tpu.train.cli",
        "--config", "configs/synthetic.py",
        "--ckpt_dir", out_dir, "--steps", str(steps),
        "--set", *PX128_BASE, *ov, "log_every=50", "image_log_every=0",
    ]
    print(f"[finish] resuming {name} to {steps} steps", flush=True)
    r = subprocess.run(args, cwd=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), timeout=7200)
    if r.returncode != 0:
        raise RuntimeError(f"resume of {name} failed rc={r.returncode}")


def eval_variant(name, base_dir):
    import jax
    import numpy as np

    from partseg_tpu.data.loader import make_loader
    from partseg_tpu.data.registry import build_dataset
    from partseg_tpu.evals.infer import load_model_and_params
    from partseg_tpu.evals.landmarks import (
        collect_mu,
        fit_landmark_regressor,
        landmark_error,
    )
    from partseg_tpu.models.partnet import PartNet
    from partseg_tpu.train.state import create_state
    from tools.validate_segmentation import main as validate_seg

    cfg = variant_cfg(name)
    out_dir = os.path.join(base_dir, name)
    model, params = load_model_and_params(cfg, out_dir)
    kwargs = dict(cfg.dataset_kwargs)
    diag = lambda gt: np.full(len(gt), 2.0 * np.sqrt(2.0))

    def error_for(p):
        tr = make_loader(build_dataset("synthetic", split="val", **kwargs),
                         64, shuffle=False, num_epochs=1)
        te = make_loader(build_dataset("synthetic", split="test", **kwargs),
                         64, shuffle=False, num_epochs=1)
        mu_tr, gt_tr = collect_mu(model, p, tr, max_batches=8)
        mu_te, gt_te = collect_mu(model, p, te, max_batches=8)
        W = fit_landmark_regressor(mu_tr, gt_tr)
        return landmark_error(W, mu_te, gt_te, iod_fn=diag)

    trained_err = error_for(params)
    rand = create_state(cfg, PartNet(cfg.model), jax.random.key(123)).params
    random_err = error_for(rand)
    # validate_seg loads its own cfg; pass the variant overrides.
    ov, _ = VARIANTS_128[name]
    seg = validate_seg(out_dir, overrides=PX128_BASE + list(ov))

    hist = [
        json.loads(l)
        for l in open(os.path.join(out_dir, "metrics.jsonl"))
    ]
    return {
        "steps": max(h["step"] for h in hist) + 1,
        "landmark_err_pct_diag": round(float(trained_err), 3),
        "landmark_err_pct_diag_random": round(float(random_err), 3),
        "equiv_last": round(float(hist[-1]["equiv"]), 4),
        "miou": seg["miou_trained"],
        "fg_iou": seg["fg_iou_trained"],
        "learned": bool(trained_err < random_err * 0.6),
        "seg_abs_pass": bool(seg["ok"]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base_dir", default="logs/quality_study_r3")
    ap.add_argument("--base_steps", type=int, default=800)
    ap.add_argument("--variants",
                    default="flagship,speed128,speed128_d64,speed128_r3")
    a = ap.parse_args()

    flag_rate = VARIANTS_128["flagship"][1]
    names = a.variants.split(",")
    budgets = {}
    # Phase 1: ALL resumes first, in subprocesses — the parent must not
    # have touched the TPU yet (single chip; two TPU processes clash).
    for name in names:
        rate = RATES.get(name) or VARIANTS_128[name][1]
        budgets[name] = (rate, max(1, round(a.base_steps * rate / flag_rate)))
        mfile = os.path.join(a.base_dir, name, "metrics.jsonl")
        last = -1
        if os.path.exists(mfile):
            for l in open(mfile):
                last = max(last, json.loads(l)["step"])
        if last + 1 < budgets[name][1]:
            resume_variant(name, budgets[name][1], a.base_dir)
    # Phase 2: evals (parent takes the chip now).
    rows = {}
    for name in names:
        rows[name] = eval_variant(name, a.base_dir)
        rows[name]["img_s_chip"] = budgets[name][0]
        print(f"[finish] {name}: {rows[name]}", flush=True)

    f = rows["flagship"]
    verdicts = {
        name: bool(
            r["learned"]
            and r["landmark_err_pct_diag"] <= 1.05 * f["landmark_err_pct_diag"]
            and r["miou"] >= 0.95 * f["miou"]
        )
        for name, r in rows.items()
        if name != "flagship"
    }
    passing = [n for n, ok in verdicts.items() if ok]
    result = {
        "mode": "128px_equal_wallclock",
        "base_steps": a.base_steps,
        "rows": rows,
        "pass_at_equal_wallclock": verdicts,
        "fastest_passing_variant": (
            max(passing, key=lambda n: rows[n]["img_s_chip"])
            if passing else None
        ),
        "gate_pass": bool(passing),
    }
    print(json.dumps(result))
    with open(os.path.join(a.base_dir, "result.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    return result


if __name__ == "__main__":
    from partseg_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    main()
