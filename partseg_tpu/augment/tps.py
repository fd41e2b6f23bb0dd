"""Thin-plate-spline warp sampler (TPU-native formulation).

Role parity: the reference's `ThinPlateSpline` / `tps_parameters` /
`make_input_tps_param` (SURVEY.md §2.1 "TPS warp sampler", [B:5],
[PAPER]). Produces, per sample:

  (a) a dense backward flow field for image warping (for every output
      pixel u, the source coordinate T(u) to sample),
  (b) the point transform T(·) and its local Jacobian J_T, used to warp
      μ and Σ in the equivariance loss (SURVEY.md §2.1 "Equivariance
      loss").

TPU-first design: the source control points are FIXED per config, so
the TPS system matrix L = [[K, P], [Pᵀ, 0]] and the dense radial basis
Φ_grid = [U(‖u−c_i‖), 1, y, x] over the pixel grid are precomputed
host-side constants. Sampling a warp is then:

    targets  = similarity(c) + noise          # [n+3, 2], zeros padded
    params   = L⁻¹ @ targets                  # [n+3, 2] spline weights
    flow     = Φ_grid @ params                # one [HW, n+3] matmul (MXU)

No per-sample linear solves, no host work, fully batched under vmap.

Math: U(r) = r² log r² (with U(0) = 0); T(u) = A·u + b + Σᵢ wᵢ U(‖u−cᵢ‖);
∂U/∂u = 2 (log r² + 1) (u − cᵢ), so the Jacobian is analytic.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _tps_u(sq_dist: jax.Array, eps: float = 1e-9) -> jax.Array:
    """U(r) as a function of squared distance s = r²: U = s·log(s), U(0)=0."""
    safe = jnp.maximum(sq_dist, eps)
    return jnp.where(sq_dist > eps, safe * jnp.log(safe), 0.0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TPSParams:
    """Per-sample spline weights: the full description of one warp.

    weights: [..., n_ctrl + 3, 2] — rows 0..n-1 are the radial weights
    w_i, the last 3 rows are the affine part [b; A] (bias, then the two
    rows of A acting on (y, x)). Column j gives the j-th output coord.
    """

    weights: jax.Array


class TPSSampler:
    """Samples paired TPS warps and evaluates them (flow / points / Jacobian).

    Args:
      grid_size: control grid is grid_size × grid_size over [-1, 1]².
      scale_sd: log-scale stddev of the global similarity.
      rot_sd: rotation stddev (radians).
      trans_sd: translation stddev (normalized coords).
      ctrl_sd: per-control-point displacement stddev (the non-rigid part).
    """

    def __init__(
        self,
        grid_size: int = 5,
        scale_sd: float = 0.10,
        rot_sd: float = 0.10,
        trans_sd: float = 0.10,
        ctrl_sd: float = 0.10,
    ):
        self.grid_size = grid_size
        self.scale_sd = scale_sd
        self.rot_sd = rot_sd
        self.trans_sd = trans_sd
        self.ctrl_sd = ctrl_sd

        n = grid_size * grid_size
        lin = np.linspace(-1.0, 1.0, grid_size, dtype=np.float64)
        yy, xx = np.meshgrid(lin, lin, indexing="ij")
        ctrl = np.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)  # [n, 2]

        # TPS system matrix L = [[K, P], [Pᵀ, 0]]; K_ij = U(‖c_i − c_j‖).
        d2 = np.sum((ctrl[:, None, :] - ctrl[None, :, :]) ** 2, axis=-1)
        with np.errstate(divide="ignore", invalid="ignore"):
            K = np.where(d2 > 0, d2 * np.log(d2), 0.0)
        P = np.concatenate([np.ones((n, 1)), ctrl], axis=-1)        # [n, 3]
        L = np.zeros((n + 3, n + 3))
        L[:n, :n] = K
        L[:n, n:] = P
        L[n:, :n] = P.T
        # Solved in f64 on host once; everything downstream is f32.
        self._ctrl = jnp.asarray(ctrl, jnp.float32)                  # [n, 2]
        self._l_inv = jnp.asarray(np.linalg.inv(L), jnp.float32)     # [n+3, n+3]
        self.n_ctrl = n
        self._ctrl_np = ctrl.astype(np.float32)
        self._basis_cache: dict[tuple[int, int], np.ndarray] = {}

    # ---------------------------------------------------------------- sampling

    def sample(self, key: jax.Array, batch: tuple[int, ...] | int) -> TPSParams:
        """Sample a batch of warps. `batch` is an int or leading-shape tuple."""
        shape = (batch,) if isinstance(batch, int) else tuple(batch)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        n = self.n_ctrl

        log_s = jax.random.normal(k1, shape) * self.scale_sd
        theta = jax.random.normal(k2, shape) * self.rot_sd
        trans = jax.random.normal(k3, shape + (2,)) * self.trans_sd
        delta = jax.random.normal(k4, shape + (n, 2)) * self.ctrl_sd

        s = jnp.exp(log_s)
        cos, sin = jnp.cos(theta), jnp.sin(theta)
        # Rotation acting on (y, x): [[cos, -sin], [sin, cos]].
        rot = jnp.stack(
            [jnp.stack([cos, -sin], -1), jnp.stack([sin, cos], -1)], -2
        )                                                            # [..., 2, 2]
        sim = s[..., None, None] * rot

        # Target location of each control point under similarity + noise.
        tgt = (
            jnp.einsum("...ij,nj->...ni", sim, self._ctrl)
            + trans[..., None, :]
            + delta
        )                                                            # [..., n, 2]
        rhs = jnp.concatenate(
            [tgt, jnp.zeros(shape + (3, 2), tgt.dtype)], axis=-2
        )                                                            # [..., n+3, 2]
        weights = jnp.einsum("ij,...jk->...ik", self._l_inv, rhs)
        return TPSParams(weights=weights)

    def sample_per_key(self, keys: jax.Array) -> TPSParams:
        """Sample one warp per key: keys [B] (key array) → params with
        leading dim B. Per-SAMPLE keys make augmentation independent of
        how the batch is sharded across devices (DP determinism)."""
        return jax.vmap(lambda k: self.sample(k, ()))(keys)

    def identity(self, batch: tuple[int, ...] | int) -> TPSParams:
        """The identity warp (for tests and unwarped streams)."""
        shape = (batch,) if isinstance(batch, int) else tuple(batch)
        n = self.n_ctrl
        rhs = jnp.concatenate(
            [
                jnp.broadcast_to(self._ctrl, shape + (n, 2)),
                jnp.zeros(shape + (3, 2), jnp.float32),
            ],
            axis=-2,
        )
        return TPSParams(weights=jnp.einsum("ij,...jk->...ik", self._l_inv, rhs))

    # -------------------------------------------------------------- evaluation

    def _basis(self, points: jax.Array) -> jax.Array:
        """Φ(p) = [U(‖p−c_i‖)..., 1, y, x] for points [..., 2] → [..., n+3]."""
        d2 = jnp.sum(
            (points[..., None, :] - self._ctrl) ** 2, axis=-1
        )                                                            # [..., n]
        ones = jnp.ones(points.shape[:-1] + (1,), points.dtype)
        return jnp.concatenate([_tps_u(d2), ones, points], axis=-1)

    def transform_points(self, params: TPSParams, points: jax.Array) -> jax.Array:
        """Apply T to points. params [..., n+3, 2] ⊗ points [..., P, 2] → [..., P, 2]."""
        phi = self._basis(points.astype(jnp.float32))                # [..., P, n+3]
        return jnp.einsum("...pn,...nk->...pk", phi, params.weights)

    def jacobian(self, params: TPSParams, points: jax.Array) -> jax.Array:
        """Analytic local Jacobian J_T at points: [..., P, 2, 2].

        J[a, b] = ∂T_a/∂u_b = A[a, b] + Σ_i w_i[a] · 2(log s_i + 1)(u − c_i)[b].
        """
        p = points.astype(jnp.float32)
        diff = p[..., None, :] - self._ctrl                          # [..., P, n, 2]
        d2 = jnp.sum(diff * diff, axis=-1)                           # [..., P, n]
        safe = jnp.maximum(d2, 1e-9)
        du = jnp.where(
            (d2 > 1e-9)[..., None], 2.0 * (jnp.log(safe) + 1.0)[..., None] * diff, 0.0
        )                                                            # [..., P, n, 2]
        w = params.weights[..., : self.n_ctrl, :]                    # [..., n, 2]
        # radial term: J_rad[a, b] = Σ_i w_i[a] du[i, b]
        j_rad = jnp.einsum("...pnb,...na->...pab", du, w)
        a_mat = params.weights[..., self.n_ctrl + 1 :, :]            # [..., 2, 2] rows=input dim
        j_aff = jnp.swapaxes(a_mat, -1, -2)                          # [a, b] = A[b_row, a_col]ᵀ
        return j_aff[..., None, :, :] + j_rad

    def flow_basis(self, h: int, w: int) -> jax.Array:
        """STATIC pixel-grid basis Φ_grid [H*W, n+3] (numpy-cached —
        never cache jnp under jit, CLAUDE.md). `Φ_grid @ weights` IS
        the dense flow; the fused TPS-warp kernel consumes this
        directly so the flow never materializes in HBM."""
        key = (h, w)
        if key not in self._basis_cache:
            from partseg_tpu.partops.coords import _coord_grid_cached

            yy, xx = _coord_grid_cached(h, w)
            grid = np.stack([yy.reshape(-1), xx.reshape(-1)], -1)   # [HW, 2]
            d2 = np.sum(
                (grid[:, None, :] - self._ctrl_np[None, :, :]) ** 2, axis=-1
            )
            with np.errstate(divide="ignore", invalid="ignore"):
                u = np.where(d2 > 1e-9, d2 * np.log(d2), 0.0)
            ones = np.ones((grid.shape[0], 1), np.float32)
            self._basis_cache[key] = np.concatenate(
                [u, ones, grid], axis=-1
            ).astype(np.float32)
        return jnp.asarray(self._basis_cache[key])

    def flow_field(self, params: TPSParams, h: int, w: int) -> jax.Array:
        """Dense backward flow: source coords T(u) for every output pixel.

        Returns [..., H, W, 2] suitable for partops.warp.warp_image.
        """
        from partseg_tpu.partops.coords import coord_grid

        yy, xx = coord_grid(h, w)
        grid = jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)  # [HW, 2]
        phi = self._basis(grid)                                      # [HW, n+3]
        flow = jnp.einsum(
            "pn,...nk->...pk", phi, params.weights,
            preferred_element_type=jnp.float32,
        )
        return flow.reshape(params.weights.shape[:-2] + (h, w, 2))

    def warp(
        self,
        params: TPSParams,
        image: jax.Array,
        padding_mode: str = "border",
        impl: str = "auto",
    ) -> jax.Array:
        """Warp a batch of images [B, H, W, C] with per-sample params.

        On TPU with border padding this takes the fully-fused path:
        flow evaluation AND bilinear sampling in one Pallas kernel
        (partops/pallas/bilinear_warp.tps_warp_fused) — the dense flow
        never exists in HBM. Other modes build the explicit flow."""
        from partseg_tpu.partops.warp import warp_image

        b, h, w, _ = image.shape
        if impl == "auto":
            impl = "fused" if jax.default_backend() == "tpu" else "gather"
        if impl == "fused" and padding_mode == "border":
            from partseg_tpu.partops.pallas import tps_warp_fused

            return tps_warp_fused(
                image, params.weights, self.flow_basis(h, w)
            )
        flow = self.flow_field(params, h, w)
        return warp_image(image, flow, padding_mode=padding_mode, impl=impl)
