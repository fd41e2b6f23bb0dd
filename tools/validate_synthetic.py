"""End-to-end accuracy validation on the synthetic blob dataset
(SURVEY.md §7.3 / §4.4): train for a few hundred steps on TPU, verify

  1. the equivariance loss falls substantially,
  2. soft-argmax μ predicts the true blob centers via the landmark
     regression protocol (error in % of image diagonal), far better
     than an untrained model.

Run: python tools/validate_synthetic.py [--steps 600]
Prints one JSON line with the results.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main(steps: int = 600, out_dir: str = "logs/validate_synthetic",
         overrides: list | None = None, eval_only: bool = False):
    from partseg_tpu.data.loader import make_loader
    from partseg_tpu.data.registry import build_dataset
    from partseg_tpu.evals.landmarks import (
        collect_mu,
        fit_landmark_regressor,
        landmark_error,
    )
    from partseg_tpu.models.partnet import PartNet
    from partseg_tpu.train.config import load_config
    from partseg_tpu.train.loop import train
    from partseg_tpu.train.state import create_state

    cfg = load_config("configs/synthetic.py")
    cfg = cfg.replace(steps=steps, ckpt_dir=out_dir, log_every=50,
                      image_log_every=0)
    if overrides:
        from partseg_tpu.train.config import apply_overrides

        cfg = apply_overrides(cfg, overrides)
    if cfg.augment.warp_every > 1 and cfg.steps % cfg.augment.warp_every:
        # warp_every periods compile as one program; round the budget UP
        # to a whole period (the loop rejects partial periods).
        we = cfg.augment.warp_every
        cfg = cfg.replace(steps=cfg.steps + we - cfg.steps % we)

    model = PartNet(cfg.model)
    if eval_only:
        # Training already happened (e.g. via the CLI's --segment_steps
        # leak-bounded path); evaluate the on-disk checkpoint.
        from partseg_tpu.evals.infer import load_model_and_params

        model, trained_params = load_model_and_params(cfg, out_dir)
    else:
        trained_params = train(cfg, restore=False).params

    # Metrics history from the run dir.
    import pathlib

    hist = [
        json.loads(l)
        for l in pathlib.Path(out_dir, "metrics.jsonl").read_text().splitlines()
    ]
    first_eq = next(h["equiv"] for h in hist if h["step"] <= 50)
    last_eq = hist[-1]["equiv"]

    # Landmark protocol: diagonal-normalized error (synthetic blobs have
    # no eyes; normalizer = constant 2·√2 ≈ full diagonal in [-1,1] coords).
    kwargs = dict(cfg.dataset_kwargs)
    diag = lambda gt: np.full(len(gt), 2.0 * np.sqrt(2.0))

    def error_for(params):
        tr = make_loader(build_dataset("synthetic", split="val", **kwargs),
                         64, shuffle=False, num_epochs=1)
        te = make_loader(build_dataset("synthetic", split="test", **kwargs),
                         64, shuffle=False, num_epochs=1)
        mu_tr, gt_tr = collect_mu(model, params, tr, max_batches=8)
        mu_te, gt_te = collect_mu(model, params, te, max_batches=8)
        W = fit_landmark_regressor(mu_tr, gt_tr)
        return landmark_error(W, mu_te, gt_te, iod_fn=diag)

    trained_err = error_for(trained_params)
    rand_state = create_state(cfg, model, jax.random.key(123))
    random_err = error_for(rand_state.params)

    ok = last_eq < first_eq * 0.5 and trained_err < random_err * 0.6
    result = {
        "equiv_first": round(float(first_eq), 4),
        "equiv_last": round(float(last_eq), 4),
        "equiv_reduction": round(float(first_eq / max(last_eq, 1e-9)), 2),
        "landmark_err_pct_diag_trained": round(trained_err, 3),
        "landmark_err_pct_diag_random": round(random_err, 3),
        "steps": steps,
        "ok": ok,
    }
    print(json.dumps(result))
    print("VALIDATION", "PASS" if ok else "FAIL")
    return result


if __name__ == "__main__":
    from partseg_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--out_dir", default="logs/validate_synthetic")
    ap.add_argument("--set", nargs="*", default=[], metavar="KEY=VAL")
    ap.add_argument("--eval_only", action="store_true",
                    help="skip training; evaluate the out_dir checkpoint "
                         "(pair with train.cli --segment_steps)")
    a = ap.parse_args()
    raise SystemExit(
        0 if main(a.steps, a.out_dir, getattr(a, "set"),
                  eval_only=a.eval_only)["ok"] else 1
    )
