"""Segmentation-IoU validation on synthetic blobs (GCPR'20 eval path
end-to-end): uses the checkpoint from tools/validate_synthetic.py and
measures part-matched mIoU / foreground IoU vs ground-truth blob masks.

Run after validate_synthetic:
    python tools/validate_segmentation.py [--ckpt_dir logs/val_long]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(ckpt_dir: str, overrides: list | None = None):
    import jax

    from partseg_tpu.data.loader import make_loader
    from partseg_tpu.data.synthetic import SyntheticBlobs
    from partseg_tpu.evals.infer import load_model_and_params
    from partseg_tpu.evals.segmentation import evaluate_segmentation
    from partseg_tpu.models.partnet import PartNet
    from partseg_tpu.train.config import load_config
    from partseg_tpu.train.state import create_state

    cfg = load_config("configs/synthetic.py").replace(ckpt_dir=ckpt_dir)
    if overrides:
        from partseg_tpu.train.config import apply_overrides

        cfg = apply_overrides(cfg, overrides)
    model, params = load_model_and_params(cfg, ckpt_dir)
    kwargs = dict(cfg.dataset_kwargs)
    kwargs.pop("n_examples", None)    # the eval split sizes itself below

    def run(p):
        ds = SyntheticBlobs(seed=2, n_examples=512, with_masks=True, **kwargs)
        it = make_loader(ds, 64, shuffle=False, num_epochs=1)
        return evaluate_segmentation(
            model, p, it, n_classes=ds.n_blobs + 1, max_batches=8
        )

    trained = run(params)
    rand = run(create_state(cfg, PartNet(cfg.model), jax.random.key(99)).params)
    result = {
        "miou_trained": round(trained["miou"], 4),
        "fg_iou_trained": round(trained["fg_iou"], 4),
        "miou_random": round(rand["miou"], 4),
        "fg_iou_random": round(rand["fg_iou"], 4),
    }
    # Round-1 bar (2000-step synthetic run reaches mIoU 0.385 / fg 0.29
    # vs random 0.157 / 0.0); tighten toward fg>0.5 once the seg loss is
    # tuned on real data in later rounds.
    ok = trained["miou"] > 2 * rand["miou"] and trained["fg_iou"] > 0.25
    result["ok"] = ok
    # "ok" must be IN the json line: study orchestrators parse the last
    # json line for it (the r4 study crashed on a pre-"ok" print here).
    print(json.dumps(result))
    print("SEG VALIDATION", "PASS" if ok else "FAIL")
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", default="logs/val_long")
    ap.add_argument("--set", nargs="*", default=[], metavar="KEY=VAL")
    a = ap.parse_args()
    raise SystemExit(0 if main(a.ckpt_dir, getattr(a, "set"))["ok"] else 1)
