"""Quality-vs-speed study (SURVEY.md §6 quality gate for the 8k push).

Trains the SAME synthetic task under (a) quality-class settings (the
flagship recipe scaled to 64px synthetic: full-resolution VGG features,
deeper hourglass) and (b) throughput-class settings (the deltas
configs/throughput128.py applies at 128px: half-resolution VGG
features, one less hourglass level / decoder scale), at EQUAL steps,
then reports landmark %-diag + part-matched mIoU side by side.

Run: python tools/quality_study.py [--steps 800]
Prints one JSON line; paste the table into STATUS.md.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    # Flagship-class at 64px synthetic (configs/synthetic.py defaults).
    "quality": [],
    # The throughput128 deltas, scaled to the 64px synthetic task:
    # depth 3→2, decoder 3→2 scales, VGG features at half res (32²)
    # with blocks ≤2 — mirroring configs/throughput128.py vs celeba.py.
    "throughput": [
        "model.depth=2",
        "model.decoder_scales=2",
        "loss.vgg_resolution=32",
        "loss.vgg_trim_blocks=2",
        "loss.vgg_layers=('relu1_2','relu2_2')",
    ],
}


def main(steps: int = 800, base_dir: str = "logs/quality_study"):
    from tools.validate_segmentation import main as validate_seg
    from tools.validate_synthetic import main as validate_syn

    rows = {}
    for name, overrides in VARIANTS.items():
        out_dir = os.path.join(base_dir, name)
        print(f"=== variant {name}: overrides={overrides} ===", flush=True)
        syn = validate_syn(steps=steps, out_dir=out_dir, overrides=overrides)
        seg = validate_seg(out_dir, overrides=overrides)
        rows[name] = {
            "landmark_err_pct_diag": syn["landmark_err_pct_diag_trained"],
            "equiv_last": syn["equiv_last"],
            "miou": seg["miou_trained"],
            "fg_iou": seg["fg_iou_trained"],
            "learned": bool(syn["ok"]),
            "seg_abs_pass": bool(seg["ok"]),
        }

    q, t = rows["quality"], rows["throughput"]
    result = {
        "steps": steps,
        "quality": q,
        "throughput": t,
        # The gate is RELATIVE (the study compares recipes; absolute
        # bars belong to validate_synthetic/validate_segmentation):
        # the throughput recipe must still learn (equivariance falls,
        # landmarks beat random) and stay within 2× landmark error and
        # 0.7× mIoU of the quality recipe at EQUAL steps — loose by
        # design: it trains with ~60% fewer FLOPs, so per wall-hour it
        # sees ~2.5× more steps. r2 @800 steps it actually WON on
        # landmarks (0.597 vs 0.708 %-diag) and fg-IoU (0.174 vs 0.150).
        "gate_pass": bool(
            t["learned"]
            and t["landmark_err_pct_diag"] <= 2.0 * q["landmark_err_pct_diag"]
            and t["miou"] >= 0.7 * q["miou"]
        ),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--base_dir", default="logs/quality_study")
    a = ap.parse_args()
    raise SystemExit(0 if main(a.steps, a.base_dir)["gate_pass"] else 1)
