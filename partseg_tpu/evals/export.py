"""Serving export — the inference forward as a portable StableHLO
artifact.

The reference distributes a torch checkpoint plus notebook code that
rebuilds the model to run it (SURVEY.md §3.2, [B:7]). The TPU-native
serving analog is ahead-of-time export: ``jax.export`` lowers the
jitted inference forward (shape encoder → part heatmaps, soft-argmax
landmarks, dense segmentation) to StableHLO with the trained weights
baked in as constants. The resulting artifact

- runs from any JAX process via ``jax.export.deserialize`` — no
  partseg_tpu code, config, or checkpoint plumbing needed at serving
  time;
- is lowered for BOTH tpu and cpu by default (single-image CPU
  inference is part of the reference's public API surface [B:7]);
- supports a symbolic batch dimension, so one artifact serves any
  request batch size.

CLI:
    python -m partseg_tpu.evals.export --config configs/celeba.py \
        --ckpt_dir logs/celeba --out partnet_infer.stablehlo --verify
"""

from __future__ import annotations

import argparse
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def make_infer_fn(model, params) -> Callable[[jax.Array], dict]:
    """Batched inference forward with weights closed over.

    images [B, H, W, 3] float32 in [0,1] →
      heatmaps  [B, h, w, K]  per-part spatial distributions
      logits    [B, h, w, K(+1)] raw shape-encoder logits
      landmarks [B, K, 2]     soft-argmax μ, (y, x) in [-1, 1]
      sigma     [B, K, 2, 2]  part covariances
      seg       [B, h, w]     int32 labels, 0 = background (GCPR'20
                              convention when the model has a bg channel)
    """
    from partseg_tpu.models.partnet import PartNet

    def infer(images: jax.Array) -> dict:
        x = images.astype(jnp.float32)
        logits = model.apply(params, x, method=PartNet.encode_shape)
        parts, mu, sigma = model.apply(params, logits, method=PartNet.shape_stats)
        seg_soft = model.apply(params, logits, method=PartNet.segmentation)
        seg = jnp.argmax(seg_soft, axis=-1).astype(jnp.int32)
        if model.cfg.background:
            k = model.cfg.n_parts
            seg = jnp.where(seg == k, 0, seg + 1)
        return {
            "heatmaps": parts,
            "logits": logits,
            "landmarks": mu,
            "sigma": sigma,
            "seg": seg,
        }

    return infer


def export_infer(model, params, img_size: int, batch: int | None = None,
                 platforms: tuple[str, ...] = ("tpu", "cpu")):
    """AOT-lower the inference forward. batch=None → symbolic batch dim
    (one artifact, any batch size); batch=N → static shapes."""
    infer = make_infer_fn(model, params)
    if batch is None:
        (b,) = jax.export.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, img_size, img_size, 3), jnp.float32)
    else:
        spec = jax.ShapeDtypeStruct((batch, img_size, img_size, 3), jnp.float32)
    return jax.export.export(jax.jit(infer), platforms=list(platforms))(spec)


def load_exported(path: str):
    """Deserialize an exported artifact; returns the callable Exported.
    Use ``exported.call(images)`` (works under jit and on any platform
    the artifact was lowered for)."""
    with open(path, "rb") as f:
        return jax.export.deserialize(bytearray(f.read()))


def main(argv=None):
    ap = argparse.ArgumentParser(description="export the inference forward")
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt_dir", default=None)
    ap.add_argument("--out", default="partnet_infer.stablehlo")
    ap.add_argument("--batch", type=int, default=None,
                    help="static batch size; default: symbolic (any batch)")
    ap.add_argument("--platforms", default="tpu,cpu")
    ap.add_argument("--cpu", action="store_true",
                    help="run the exporting process on the CPU backend")
    ap.add_argument("--verify", action="store_true",
                    help="deserialize the artifact and check it matches "
                         "the direct forward on random input")
    args = ap.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from partseg_tpu.evals.infer import load_model_and_params
    from partseg_tpu.train.config import load_config

    cfg = load_config(args.config)
    model, params = load_model_and_params(cfg, args.ckpt_dir)
    exported = export_infer(
        model, params, cfg.model.img_size, batch=args.batch,
        platforms=tuple(args.platforms.split(",")),
    )
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"[export] wrote {args.out}: {len(blob)/1e6:.1f} MB, "
          f"platforms={exported.platforms}, "
          f"in_shape={exported.in_avals[0].shape}")

    if args.verify:
        reloaded = load_exported(args.out)
        x = np.random.default_rng(0).uniform(
            size=(args.batch or 2, cfg.model.img_size, cfg.model.img_size, 3)
        ).astype(np.float32)
        got = reloaded.call(x)
        want = jax.jit(make_infer_fn(model, params))(x)
        for k in want:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(want[k]), rtol=2e-2, atol=2e-2,
                err_msg=k,
            )
        print("[export] verify OK: deserialized artifact matches the "
              "direct forward")


if __name__ == "__main__":
    main()
