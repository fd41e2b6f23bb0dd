"""Coordinate grids and moment bases.

Convention (used EVERYWHERE in this package):
  * images are NHWC;
  * a pixel location is a 2-vector ``u = (y, x)`` in normalized
    coordinates, with ``y, x ∈ [-1, 1]`` mapping to the pixel *centers*
    of rows/columns 0..H-1 / 0..W-1 via ``y = -1 + 2*(i + 0.5)/H``
    (``align_corners=False`` in torch terms). This keeps the grid
    resolution-consistent: downsampling an image does not move content
    in normalized coordinates.

Role parity: the coordinate/meshgrid helpers of the reference's ops
module (SURVEY.md §2.1 "Soft-argmax μ/Σ extraction", [B:5]).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

# The caches hold NUMPY arrays, never jnp: jnp ops inside a jit trace
# produce tracers, and caching a tracer leaks it into later traces.


@functools.lru_cache(maxsize=32)
def _coord_grid_cached(h: int, w: int) -> tuple:
    ys = -1.0 + (2.0 * (np.arange(h, dtype=np.float32) + 0.5)) / h
    xs = -1.0 + (2.0 * (np.arange(w, dtype=np.float32) + 0.5)) / w
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    return yy, xx


def coord_grid(h: int, w: int, dtype=jnp.float32):
    """Return (yy, xx), each [H, W], normalized pixel-center coords in [-1, 1]."""
    yy, xx = _coord_grid_cached(h, w)
    return jnp.asarray(yy, dtype), jnp.asarray(xx, dtype)


@functools.lru_cache(maxsize=32)
def _moment_basis_cached(h: int, w: int):
    yy, xx = _coord_grid_cached(h, w)
    y = yy.reshape(-1)
    x = xx.reshape(-1)
    # Columns: [y, x, y*y, y*x, x*x] — one matmul against the normalized
    # part maps yields all first and second raw moments (MXU-friendly).
    return np.stack([y, x, y * y, y * x, x * x], axis=-1)  # [H*W, 5]


def moment_basis(h: int, w: int, dtype=jnp.float32):
    """[H*W, 5] basis of (y, x, y², yx, x²) monomials at the pixel centers.

    ``p_flat @ moment_basis`` gives raw moments E[y], E[x], E[y²], E[yx],
    E[x²] of a spatial distribution p in one MXU contraction.
    """
    return jnp.asarray(_moment_basis_cached(h, w), dtype)
