"""Single-image inference — the reference notebooks' public API
(SURVEY.md §3.2, [B:5,7]): load config + checkpoint (CPU-capable),
forward the shape encoder only, produce part activation maps,
soft-argmax landmarks, and the argmax part segmentation overlay.

CLI: python -m partseg_tpu.evals.infer --config configs/celeba.py \
        --ckpt_dir logs/celeba --image face.png --out viz.png
"""

from __future__ import annotations

import argparse
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def load_model_and_params(cfg, ckpt_dir: str | None):
    """Build PartNet from cfg; restore latest checkpoint params if present."""
    from partseg_tpu.models.partnet import PartNet
    from partseg_tpu.train.checkpoint import CheckpointManager
    from partseg_tpu.train.state import create_state

    model = PartNet(cfg.model)
    state = create_state(cfg, model, jax.random.key(0))
    if ckpt_dir is not None:
        mgr = CheckpointManager(ckpt_dir)
        restored = mgr.restore_latest(state)
        if restored is not None:
            state = restored[0]
            print(f"[infer] restored step {restored[1]}")
        mgr.close()
    return model, state.params


def infer_image(model, params, image: np.ndarray) -> dict[str, np.ndarray]:
    """image [H, W, 3] float in [0,1] → dict of inference outputs.

    Returns: heatmaps [h, w, K] spatial distributions, seg [h, w] argmax
    labels (0 = background if the model has a bg channel), landmarks
    [K, 2] (y, x) in [-1, 1], logits [h, w, K(+1)].
    """
    from partseg_tpu.models.partnet import PartNet

    x = jnp.asarray(image, jnp.float32)[None]
    logits = model.apply(params, x, method=PartNet.encode_shape)
    parts, mu, sigma = model.apply(params, logits, method=PartNet.shape_stats)
    seg_soft = model.apply(params, logits, method=PartNet.segmentation)
    seg = jnp.argmax(seg_soft, axis=-1)
    if model.cfg.background:
        # softmax channel order is [parts..., bg]; relabel so bg -> 0,
        # part k -> k+1 (the GCPR'20 label convention).
        k = model.cfg.n_parts
        seg = jnp.where(seg == k, 0, seg + 1)
    return {
        "heatmaps": np.asarray(parts[0]),
        "seg": np.asarray(seg[0]),
        "landmarks": np.asarray(mu[0]),
        "sigma": np.asarray(sigma[0]),
        "logits": np.asarray(logits[0]),
    }


def render_overlay(image: np.ndarray, out: dict[str, np.ndarray]) -> np.ndarray:
    """Blend the part segmentation + landmarks into an RGB visualization."""
    h, w, _ = image.shape
    seg = out["seg"]
    k = int(seg.max()) + 1
    rng = np.random.default_rng(0)
    palette = np.concatenate(
        [np.zeros((1, 3)), rng.uniform(0.3, 1.0, size=(max(k - 1, 1), 3))]
    )
    seg_rgb = palette[seg]                                     # [h, w, 3]
    sh, sw = seg.shape
    seg_up = np.kron(seg_rgb, np.ones((h // sh, w // sw, 1)))[:h, :w]
    overlay = 0.6 * image + 0.4 * seg_up
    for y, x in out["landmarks"]:
        iy = int((y + 1) * 0.5 * h)
        ix = int((x + 1) * 0.5 * w)
        overlay[max(iy - 2, 0) : iy + 3, max(ix - 2, 0) : ix + 3] = [1.0, 0.0, 0.0]
    return np.clip(overlay, 0, 1)


def main(argv=None):
    ap = argparse.ArgumentParser(description="partseg_tpu single-image inference")
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt_dir", default=None)
    ap.add_argument("--image", required=True, help="input image path")
    ap.add_argument("--out", default="infer_out.png")
    ap.add_argument("--cpu", action="store_true", help="force CPU (notebook parity)")
    args = ap.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from partseg_tpu.train.config import load_config

    cfg = load_config(args.config)
    model, params = load_model_and_params(cfg, args.ckpt_dir)

    import cv2

    img = cv2.imread(args.image)[..., ::-1].astype(np.float32) / 255.0
    s = cfg.model.img_size
    img = cv2.resize(img, (s, s), interpolation=cv2.INTER_AREA)
    out = infer_image(model, params, img)
    viz = render_overlay(img, out)
    cv2.imwrite(args.out, (viz[..., ::-1] * 255).astype(np.uint8))
    print(f"[infer] landmarks:\n{out['landmarks']}")
    print(f"[infer] wrote {args.out}")


if __name__ == "__main__":
    main()
