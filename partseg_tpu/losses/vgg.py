"""VGG19 feature extractor (Flax) for the perceptual loss.

Role parity: SURVEY.md §2.1 "VGG19 perceptual loss" [B:5][PAPER]. The
reference downloads torchvision's ImageNet weights; this environment
has no network (SURVEY.md §7.4 risk 2), so the loader accepts a
user-provided ``vgg19.npz`` and otherwise falls back to a DETERMINISTIC
random initialization (fixed seed) — random VGG features are a known,
weaker-but-workable perceptual metric. The accuracy caveat is
documented in README.md.

Weight file format: npz with keys ``conv{block}_{idx}/kernel`` [3,3,Cin,Cout]
and ``conv{block}_{idx}/bias`` [Cout] (HWIO, NHWC convention — torch
exporters must transpose OIHW→HWIO).

`trim_blocks` drops the deepest blocks: SURVEY.md §6 notes dropping the
conv5 block roughly halves the loss FLOPs — the throughput-benchmark
configs use trim_blocks=4.
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# VGG19: (block, n_convs, channels)
_VGG19_BLOCKS = ((1, 2, 64), (2, 2, 128), (3, 4, 256), (4, 4, 512), (5, 4, 512))

# ImageNet normalization (the pretrained weights' input convention).
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGG19Features(nn.Module):
    """Returns the dict of post-ReLU feature maps named like "relu3_2".

    extract: which activations to return. Compute stops at the deepest
    requested one (and never past `trim_blocks`).
    """

    extract: Sequence[str] = ("relu1_2", "relu2_2", "relu3_2", "relu4_2")
    trim_blocks: int = 5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> dict[str, jax.Array]:
        mean = jnp.asarray(_MEAN, x.dtype)
        std = jnp.asarray(_STD, x.dtype)
        h = (x - mean) / std
        wanted = set(self.extract)
        deepest = max(
            (b, i)
            for b, n, _ in _VGG19_BLOCKS
            for i in range(1, n + 1)
            if f"relu{b}_{i}" in wanted
        )
        feats: dict[str, jax.Array] = {}
        for block, n_convs, ch in _VGG19_BLOCKS[: self.trim_blocks]:
            for i in range(1, n_convs + 1):
                h = nn.Conv(
                    ch, (3, 3), padding="SAME", name=f"conv{block}_{i}",
                    dtype=self.dtype, param_dtype=jnp.float32,
                )(h)
                h = nn.relu(h)
                name = f"relu{block}_{i}"
                if name in wanted:
                    feats[name] = h
                if (block, i) == deepest:
                    return feats
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
        return feats


def random_vgg19_params(model: VGG19Features, img_size: int, seed: int = 1742) -> Any:
    """Deterministic random-init VGG parameters (the offline fallback)."""
    x = jnp.zeros((1, img_size, img_size, 3))
    return model.init(jax.random.key(seed), x)


def load_vgg19_npz(
    model: VGG19Features, path: str | None, img_size: int
) -> tuple[Any, str]:
    """Load pretrained weights from npz; fall back to random init.

    Looks at `path`, then $VGG19_NPZ, then ./vgg19.npz. Returns
    (params, mode) where mode is "pretrained:<path>" or "random" — the
    caller must surface the mode (a run trained against random VGG
    features is NOT accuracy-comparable to the reference; VERDICT r1
    "silent VGG fallback").
    """
    candidates = [path, os.environ.get("VGG19_NPZ"), "vgg19.npz"]
    npz_path = next((p for p in candidates if p and os.path.exists(p)), None)
    params = random_vgg19_params(model, img_size)
    if npz_path is None:
        import warnings

        warnings.warn(
            "VGG19 pretrained weights NOT found (looked at --set "
            "loss.vgg_npz, $VGG19_NPZ, ./vgg19.npz) — using the "
            "DETERMINISTIC RANDOM-INIT fallback. Perceptual quality will "
            "be below the reference; accuracy claims vs the paper are "
            "invalid in this mode. Export weights with "
            "tools/export_vgg19.py.",
            stacklevel=2,
        )
        return params, "random"
    data = np.load(npz_path)
    flat = dict(params["params"])

    def fill(tree):
        out = {}
        for name, leaf in tree.items():
            if isinstance(leaf, dict):
                out[name] = {
                    pname: jnp.asarray(data[f"{name}/{pname}"]).astype(arr.dtype)
                    if f"{name}/{pname}" in data
                    else arr
                    for pname, arr in leaf.items()
                }
            else:
                out[name] = leaf
        return out

    return {"params": fill(flat)}, f"pretrained:{npz_path}"
