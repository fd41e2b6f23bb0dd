"""Shape and appearance encoders.

Role parity: SURVEY.md §2.1 "Hourglass shape encoder" (→ K-channel part
logits at H/2, optional +1 background channel) and "Appearance encoder"
(→ C-channel feature map) [B:5][PAPER].
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from partseg_tpu.models.blocks import ConvBlock, ResBlock
from partseg_tpu.models.hourglass import Hourglass


class _Stem(nn.Module):
    """Space-to-depth stem: [B, H, W, 3] → [B, H/s, W/s, F].

    An s×s space-to-depth (3 → 3s² channels) followed by a 3×3 conv
    replaces the classic 7×7/2 conv: a stride-2 conv on a 3-channel
    NHWC tensor runs at 3/128 lane utilization on the MXU, while the
    12-channel stride-1 form does the same receptive-field work on a
    4× smaller spatial grid with 4× the channels. stride=4 is the
    bandwidth-roofline knob: the whole trunk then runs at img/4
    resolution, quartering its HBM bytes (quality-gated in configs).
    """

    features: int
    dtype: Any
    norm: str = "block"
    stride: int = 2
    act_quant: str = "none"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # 6-D reshape/transpose space-to-depth. (A strided-slice+concat
        # variant measured SLOWER full-step: 789 vs 815 img/s/chip.)
        b, h, w, c = x.shape
        s = self.stride
        x = x.reshape(b, h // s, s, w // s, s, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // s, w // s, s * s * c)
        x = nn.Conv(
            self.features // 2, (3, 3), dtype=self.dtype, param_dtype=jnp.float32
        )(x)
        return ResBlock(self.features, norm=self.norm,
                        act_quant=self.act_quant, dtype=self.dtype)(x)


class ShapeEncoder(nn.Module):
    """x → part logits [B, H/stem_stride, W/stem_stride, K(+1 bg)]."""

    n_parts: int = 10
    background: bool = True
    depth: int = 4
    features: int = 128
    n_stacks: int = 1
    remat: bool = False
    norm: str = "block"
    stem_stride: int = 2
    # 2× NN-upsample the trunk output before the logit head: recovers
    # stem_stride=4's part-map resolution (back to img/2) for the cost
    # of the head alone at the finer grid — the quality fallback if the
    # coarse maps miss the mIoU gate (docs/perf_ledger.md r3).
    head_upsample: bool = False
    act_quant: str = "none"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from partseg_tpu.models.blocks import upsample2x

        hg = nn.remat(Hourglass) if self.remat else Hourglass
        x = _Stem(self.features, self.dtype, self.norm, self.stem_stride,
                  self.act_quant)(x)
        for _ in range(self.n_stacks):
            x = hg(self.depth, self.features, norm=self.norm,
                   act_quant=self.act_quant, dtype=self.dtype)(x)
        if self.head_upsample:
            x = upsample2x(x)
        x = ConvBlock(self.features, kernel=1, dtype=self.dtype)(x)
        k = self.n_parts + (1 if self.background else 0)
        # Logit head in f32: feeds softmaxes directly.
        return nn.Conv(k, (1, 1), dtype=jnp.float32, param_dtype=jnp.float32)(x)


class AppearanceEncoder(nn.Module):
    """x → appearance features [B, H/stem_stride, W/stem_stride, C]."""

    out_features: int = 128
    depth: int = 4
    features: int = 128
    remat: bool = False
    norm: str = "block"
    stem_stride: int = 2
    head_upsample: bool = False      # must match the shape encoder's
    act_quant: str = "none"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from partseg_tpu.models.blocks import upsample2x

        hg = nn.remat(Hourglass) if self.remat else Hourglass
        x = _Stem(self.features, self.dtype, self.norm, self.stem_stride,
                  self.act_quant)(x)
        x = hg(self.depth, self.features, norm=self.norm,
               act_quant=self.act_quant, dtype=self.dtype)(x)
        if self.head_upsample:
            x = upsample2x(x)        # features must match the part masks' grid
        x = ConvBlock(self.features, kernel=1, dtype=self.dtype)(x)
        return nn.Conv(
            self.out_features, (1, 1), dtype=self.dtype, param_dtype=jnp.float32
        )(x)
