"""Appearance transfer / swap between two images (SURVEY.md §3.4,
[B:8,10]): shape (μ, Σ) from image 1, per-part appearance from image 2,
decode → image with 1's geometry and 2's appearance.

CLI: python -m partseg_tpu.evals.transfer --config configs/deepfashion.py \
        --ckpt_dir logs/deepfashion --shape a.jpg --appearance b.jpg --out t.png
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def transfer(model, params, shape_img: np.ndarray, app_img: np.ndarray) -> np.ndarray:
    """shape_img, app_img: [H, W, 3] f32 in [0,1] → [H, W, 3] transfer."""
    from partseg_tpu.models.partnet import PartNet
    from partseg_tpu.partops.pooling import pool_appearance

    xs = jnp.asarray(shape_img, jnp.float32)[None]
    xa = jnp.asarray(app_img, jnp.float32)[None]

    logits_s = model.apply(params, xs, method=PartNet.encode_shape)
    _, mu, sigma = model.apply(params, logits_s, method=PartNet.shape_stats)

    logits_a = model.apply(params, xa, method=PartNet.encode_shape)
    parts_a, _, _ = model.apply(params, logits_a, method=PartNet.shape_stats)
    feats_a = model.apply(params, xa, method=PartNet.encode_appearance)
    app_vec = pool_appearance(feats_a, parts_a)

    recon = model.apply(params, mu, sigma, app_vec, method=PartNet.decode)
    return np.asarray(recon[0], np.float32)


def main(argv=None):
    ap = argparse.ArgumentParser(description="partseg_tpu appearance transfer")
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt_dir", default=None)
    ap.add_argument("--shape", required=True, help="image providing geometry")
    ap.add_argument("--appearance", required=True, help="image providing appearance")
    ap.add_argument("--out", default="transfer_out.png")
    args = ap.parse_args(argv)

    import cv2

    from partseg_tpu.evals.infer import load_model_and_params
    from partseg_tpu.train.config import load_config

    cfg = load_config(args.config)
    if cfg.model.decoder_out_size:
        # Throughput configs train the (fully convolutional) decoder at
        # the loss resolution; inference decodes at full image size with
        # the same params.
        import dataclasses

        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, decoder_out_size=None)
        )
    model, params = load_model_and_params(cfg, args.ckpt_dir)
    s = cfg.model.img_size

    def load(p):
        img = cv2.imread(p)[..., ::-1].astype(np.float32) / 255.0
        return cv2.resize(img, (s, s), interpolation=cv2.INTER_AREA)

    out = transfer(model, params, load(args.shape), load(args.appearance))
    cv2.imwrite(args.out, (np.clip(out, 0, 1)[..., ::-1] * 255).astype(np.uint8))
    print(f"[transfer] wrote {args.out}")


if __name__ == "__main__":
    main()
