"""Image decoder: (μ, Σ, appearance vectors) → RGB reconstruction.

Role parity: SURVEY.md §2.1 "Image decoder" + "Decoder input assembly"
[B:8,10][PAPER]: at each decoder resolution the part blobs are rendered
from (μ, Σ) and combined with the per-part appearance vectors via
Σ_k φ_k(u) ⊗ a_k (partops.assembly), injected into a progressive
2×-upsampling CNN. Appearance transfer/swap (SURVEY.md §3.4) is just
calling this with appearance vectors pooled from a different image.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from partseg_tpu.models.blocks import ResBlock, upsample2x
from partseg_tpu.partops.assembly import assemble_decoder_input
from partseg_tpu.partops.moments import precision_from_cov
from partseg_tpu.partops.render import render_gaussians


class Decoder(nn.Module):
    """Decode at `out_size` from `n_scales` progressively rendered scales.

    Scale i runs at resolution out_size / 2**(n_scales-1-i); blobs are
    re-rendered at every scale (the precision matrix is computed once).
    """

    out_size: int = 128
    n_scales: int = 4
    # Channel pyramid, coarse → fine. Halving features as resolution
    # doubles keeps per-scale conv cost roughly constant instead of
    # exploding at full res (the profiled decoder hotspot). An int means
    # the same width everywhere.
    features: Any = (256, 128, 64, 32)
    render_kernel: str = "gauss"
    use_pallas: bool = True
    norm: str = "block"
    # Project the [B, K, C] appearance vectors down to each scale's
    # pyramid width BEFORE the Σφ⊗a assembly (a tiny [C, f] Dense per
    # scale). Without this, the finest scale materializes a
    # [B, S, S, C=128] assembled tensor — 537 MB bf16 at B=128/128px,
    # the single largest HBM object in the r2 trace — for a ResBlock
    # that immediately projects to 32 channels anyway.
    app_proj: bool = True
    act_quant: str = "none"
    dtype: Any = jnp.bfloat16

    def _feat(self, i: int) -> int:
        if isinstance(self.features, int):
            return self.features
        return self.features[min(i, len(self.features) - 1)]

    @nn.compact
    def __call__(
        self, mu: jax.Array, sigma: jax.Array, appearance: jax.Array
    ) -> jax.Array:
        """mu [B,K,2], sigma [B,K,2,2], appearance [B,K,C] → [B,S,S,3] in [0,1]."""
        lam = precision_from_cov(sigma)
        app = appearance.astype(self.dtype)

        x = None
        for i in range(self.n_scales):
            res = self.out_size // (2 ** (self.n_scales - 1 - i))
            f = self._feat(i)
            a_i = (
                nn.Dense(f, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"app_proj_{i}")(app)
                if self.app_proj
                else app
            )
            if self.use_pallas:
                from partseg_tpu.partops.pallas import render_assemble

                feat = render_assemble(
                    mu, lam, a_i, res, res, self.render_kernel
                ).astype(self.dtype)
            else:
                blobs = render_gaussians(
                    mu, sigma, res, res,
                    kernel=self.render_kernel, precision=lam, dtype=self.dtype,
                )
                feat = assemble_decoder_input(blobs, a_i)   # [B, res, res, f]
            x = feat if x is None else jnp.concatenate([upsample2x(x), feat], axis=-1)
            x = ResBlock(f, norm=self.norm, act_quant=self.act_quant,
                         dtype=self.dtype)(x)
            x = ResBlock(f, norm=self.norm, act_quant=self.act_quant,
                         dtype=self.dtype)(x)
        rgb = nn.Conv(3, (1, 1), dtype=jnp.float32, param_dtype=jnp.float32)(x)
        return nn.sigmoid(rgb)
