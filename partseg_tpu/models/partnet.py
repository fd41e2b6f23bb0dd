"""PartNet: the full disentangling model (the reference's `Model` role).

Forward semantics (SURVEY.md §3.1, [B:5]):

  shape stream on x_a (appearance view, geometry of x):
      logits_a → spatial part distributions → (μ_a, Σ_a)
  shape stream on x_s (spatial view): part masks for pooling
  appearance stream on x_s: features f; a_k = pool(f, parts_s)
  reconstruction: Decoder(render(μ_a, Σ_a) ⊗ a) ≈ x  (original image)

Both per-pixel part softmax (dense segmentation, GCPR'20) and per-part
spatial normalization (for moments) are produced — SURVEY.md §2.1.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from partseg_tpu.models.decoder import Decoder
from partseg_tpu.models.encoders import AppearanceEncoder, ShapeEncoder
from partseg_tpu.partops.moments import soft_argmax_moments
from partseg_tpu.partops.pooling import pool_appearance
from partseg_tpu.partops.softmax import part_softmax, spatial_softmax


@dataclasses.dataclass(frozen=True)
class PartNetConfig:
    """Static model hyperparameters (mirrors the reference's YAML keys,
    SURVEY.md §5.6: n_parts, image size, features, render kernel...)."""

    n_parts: int = 10
    img_size: int = 128
    background: bool = True          # extra background channel in part softmax
    features: int = 128              # hourglass width
    depth: int = 4                   # hourglass depth (map_size / 2**depth ≥ 1)
    n_stacks: int = 1                # stacked hourglasses in the shape encoder
    app_features: int = 128          # appearance vector dim C
    # Stem space-to-depth factor: the whole trunk runs at img_size /
    # stem_stride. 4 quarters the trunk's HBM bytes vs 2 (the step is
    # bandwidth-bound) at the cost of coarser part maps — quality-gated
    # per config (tools/validate_synthetic.py).
    stem_stride: int = 2
    # 2× upsample before both encoders' heads: part maps back at
    # img/(stem_stride/2) — the stem_stride=4 quality fallback.
    head_upsample: bool = False
    decoder_scales: int = 4
    decoder_features: Any = (256, 128, 64, 32)  # channel pyramid coarse→fine
    # Reconstruction resolution. None = img_size. When the perceptual
    # loss consumes vgg_resolution=64 features anyway, decoding at 64
    # deletes the decoder's full-res scale — the single largest HBM
    # object family in the r3 trace ([B,128,128,72] concat + ResBlocks).
    # The decoder is fully convolutional: the SAME params decode at any
    # out_size, so inference can rebuild with decoder_out_size=None for
    # full-res reconstructions from a 64-trained checkpoint.
    decoder_out_size: Any = None
    render_kernel: str = "gauss"     # "gauss" | "heavy_tail" (§7.4 risk 1 knob)
    spatial_norm: str = "softmax"    # "softmax" | "divide" (§7.4 risk 1 knob)
    # Appearance-pooling masks: "pixel" = per-pixel part softmax
    # (parts + background compete per pixel; reconstruction then TRAINS
    # the dense segmentation — the GCPR'20 behavior); "spatial" = the
    # per-part spatial distributions (pure Lorenz'19 landmarks; the
    # segmentation head stays untrained).
    pool_masks: str = "pixel"
    # Part-op implementation. False (default) = pure-XLA ops: measured
    # FASTER full-step than the fused Pallas kernels (938 vs 817 img/s
    # flagship B=128, r2 A/B) — custom calls fragment XLA fusion regions
    # and force operand-layout copies that cost more than the kernels
    # save. True keeps the kernels (parity+grad tested) for shapes
    # where XLA's fusions regress. The bilinear WARP is separate
    # (augment.warp_impl) and stays Pallas: XLA's gather is 3× slower.
    use_pallas: bool = False
    remat: bool = False              # rematerialize hourglasses (memory↓, FLOPs↑)
    # ResBlock normalization: "block" (one GN per block, default),
    # "group" (GN before every conv), "none" (perf probe — GN is a
    # measurable share of the memory-bound step cost).
    norm: str = "block"
    # Activation STORAGE quantization at ResBlock boundaries: "none" |
    # "f8" (float8_e4m3 fusion-boundary buffers, straight-through grad —
    # blocks.f8_store). The step is HBM-bandwidth-bound; f8 halves the
    # inter-block bytes while compute stays in `dtype`. Quality-gated
    # per config like every bandwidth knob.
    act_quant: str = "none"
    dtype: Any = jnp.bfloat16

    @property
    def map_size(self) -> int:
        s = self.img_size // self.stem_stride
        return s * 2 if self.head_upsample else s


class PartNetOutputs(flax.struct.PyTreeNode):
    recon: jax.Array        # [B, S, S, 3] reconstruction of x
    logits_a: jax.Array     # [B, S/2, S/2, K(+1)] shape logits on x_a
    logits_s: jax.Array     # same, on x_s
    parts_a: jax.Array      # [B, S/2, S/2, K] spatial distributions (x_a)
    parts_s: jax.Array      # [B, S/2, S/2, K] spatial distributions (x_s)
    seg_a: jax.Array        # [B, S/2, S/2, K(+1)] per-pixel part softmax (x_a)
    mu_a: jax.Array         # [B, K, 2]
    sigma_a: jax.Array      # [B, K, 2, 2]
    mu_s: jax.Array         # [B, K, 2]
    sigma_s: jax.Array      # [B, K, 2, 2]
    appearance: jax.Array   # [B, K, C] pooled from x_s


class PartNet(nn.Module):
    cfg: PartNetConfig

    def setup(self):
        c = self.cfg
        self.shape_enc = ShapeEncoder(
            n_parts=c.n_parts, background=c.background, depth=c.depth,
            features=c.features, n_stacks=c.n_stacks, remat=c.remat,
            norm=c.norm, stem_stride=c.stem_stride,
            head_upsample=c.head_upsample, act_quant=c.act_quant,
            dtype=c.dtype,
        )
        self.app_enc = AppearanceEncoder(
            out_features=c.app_features, depth=c.depth,
            features=c.features, remat=c.remat, norm=c.norm,
            stem_stride=c.stem_stride, head_upsample=c.head_upsample,
            act_quant=c.act_quant, dtype=c.dtype,
        )
        self.decoder = Decoder(
            out_size=c.decoder_out_size or c.img_size, n_scales=c.decoder_scales,
            features=c.decoder_features, render_kernel=c.render_kernel,
            use_pallas=c.use_pallas, norm=c.norm, act_quant=c.act_quant,
            dtype=c.dtype,
        )

    # ------------------------------------------------------------- components

    def encode_shape(self, x: jax.Array) -> jax.Array:
        """x [B,S,S,3] → part logits [B,S/2,S/2,K(+1)] (inference entry,
        SURVEY.md §3.2 — runs without the decoder)."""
        return self.shape_enc(x)

    def shape_stats(self, logits: jax.Array):
        """logits → (spatial part distributions [B,h,w,K], μ, Σ).

        The background channel (if any) participates in the per-pixel
        softmax but is excluded from moments.
        """
        k = self.cfg.n_parts
        fg = logits[..., :k]
        if self.cfg.spatial_norm == "softmax":
            if self.cfg.use_pallas:
                from partseg_tpu.partops.pallas import softmax_moments

                return softmax_moments(fg)
            parts = spatial_softmax(fg)
        else:
            parts = _normalize_divide(fg)
        mu, sigma = soft_argmax_moments(parts)
        return parts, mu, sigma

    def encode_appearance(self, x: jax.Array) -> jax.Array:
        """x [B,S,S,3] → appearance features [B,S/2,S/2,C] (for pooling;
        the appearance-transfer path, SURVEY.md §3.4)."""
        return self.app_enc(x)

    def segmentation(self, logits: jax.Array) -> jax.Array:
        """Per-pixel part softmax over K(+bg) channels (GCPR'20 path)."""
        return part_softmax(logits)

    def decode(self, mu, sigma, appearance) -> jax.Array:
        return self.decoder(mu, sigma, appearance)

    # ------------------------------------------------------------ full forward

    def __call__(self, x_s: jax.Array, x_a: jax.Array) -> PartNetOutputs:
        # One batched forward for both streams: 2B batch keeps the MXU
        # fuller and halves kernel launches vs two B-sized calls.
        b = x_s.shape[0]
        logits_both = self.shape_enc(jnp.concatenate([x_a, x_s], axis=0))
        logits_a, logits_s = logits_both[:b], logits_both[b:]
        parts_a, mu_a, sigma_a = self.shape_stats(logits_a)
        parts_s, mu_s, sigma_s = self.shape_stats(logits_s)

        feats_s = self.app_enc(x_s)
        if self.cfg.pool_masks == "pixel":
            # Per-pixel competition (K parts + bg): reconstruction must
            # route appearance through these masks, training the dense
            # segmentation path end-to-end.
            masks_s = self.segmentation(logits_s)[..., : self.cfg.n_parts]
        else:
            masks_s = parts_s
        appearance = pool_appearance(feats_s, masks_s)      # [B, K, C] f32

        recon = self.decoder(mu_a, sigma_a, appearance)
        return PartNetOutputs(
            recon=recon,
            logits_a=logits_a, logits_s=logits_s,
            parts_a=parts_a, parts_s=parts_s,
            seg_a=self.segmentation(logits_a),
            mu_a=mu_a, sigma_a=sigma_a, mu_s=mu_s, sigma_s=sigma_s,
            appearance=appearance,
        )


def _normalize_divide(fg_logits: jax.Array) -> jax.Array:
    """softplus → divide-by-sum spatial normalization (the knob's second
    setting; softplus keeps activations positive)."""
    from partseg_tpu.partops.softmax import normalize_maps

    return normalize_maps(jax.nn.softplus(fg_logits.astype(jnp.float32)))
