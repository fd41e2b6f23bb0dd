"""Hourglass module (encoder–decoder with skip connections).

Role parity: SURVEY.md §2.1 "Hourglass shape encoder" [B:5][PAPER] —
the Newell-style recursive hourglass: at each level, a skip branch at
the current resolution and a pooled branch that recurses, then 2×
upsample and add. Static Python recursion (depth is a config constant),
so XLA sees a fully unrolled, fusible graph.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from partseg_tpu.models.blocks import ResBlock, upsample2x


class Hourglass(nn.Module):
    """One hourglass: [B, H, W, C] → [B, H, W, C] (H, W divisible by 2**depth)."""

    depth: int = 4
    features: int = 128
    norm: str = "block"          # ResBlock norm mode (perf knob)
    act_quant: str = "none"      # ResBlock output storage dtype (perf knob)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        f, dt, nm, aq = self.features, self.dtype, self.norm, self.act_quant

        def block(x):
            return ResBlock(f, norm=nm, act_quant=aq, dtype=dt)(x)

        def level(x: jax.Array, d: int) -> jax.Array:
            up = block(x)
            # nn.avg_pool beats a reshape-mean here (measured 815 vs 789
            # img/s/chip full-step — trace attribution of reduce_window
            # cost was misleading; XLA fuses it well in-graph).
            low = nn.avg_pool(x, (2, 2), strides=(2, 2))
            low = block(low)
            low = level(low, d - 1) if d > 1 else block(low)
            low = block(low)
            return up + upsample2x(low)

        return level(x, self.depth)
