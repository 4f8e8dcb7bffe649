"""Pose-only refinement from 3D->2D correspondences (batched GN on se(3)).

The reference has no relocalization path at all: when tracking fails it
crashes (reference src/Frame.cpp:56 on an empty frame) and the pose chain
can never re-anchor to the map. Here, map-associated landmarks (the output
of search-by-projection, the analogue of reference src/vslam.cpp:129-161)
directly constrain the camera pose: a Gauss-Newton polish of T_cw over the
masked (X_world, uv) pairs, Huber-robust, fully vmapped/static-shape so it
runs inside the jitted track step every frame at negligible cost
(N<=3072 points x 2x6 Jacobians -> one 6x6 solve per iteration).

Used by pipeline/tracker.py as the PRIMARY pose path (step 7b): every
frame, the candidate pose (essential-chained on success, constant-velocity
extrapolated on failure) seeds association, then this refine anchors the
committed camera pose to the map — removing the multiplicative scale chain
that pure essential-matrix odometry compounds. The failure case is the same
code path, doubling as blackout relocalization.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..optimizer.ba import _jacobians, _project_residual


class PnPResult(NamedTuple):
    T_cw: jnp.ndarray        # (4, 4) refined world->camera transform
    num_inliers: jnp.ndarray  # () i32 points with final residual < inlier_px
    rmse: jnp.ndarray        # () f32 inlier reprojection RMSE


def refine_pose(T_cw0, X_w, uv, mask, K_intr, iters: int = 8,
                huber_delta: float = 2.0, inlier_px: float = 3.0,
                weights=None) -> PnPResult:
    """Gauss-Newton pose-only refinement.

    Args:
      T_cw0: (4, 4) initial world->camera transform.
      X_w:   (N, 3) world landmarks.
      uv:    (N, 2) measured pixels.
      mask:  (N,) bool valid correspondences.
      K_intr: (3, 3) intrinsics.
      weights: optional (N,) prior residual weights (e.g. inverse
        landmark-depth-variance maturity weights, pipeline/tracker.py 7b)
        multiplied into the per-iteration Huber weights; the inlier COUNT
        and RMSE reported are unweighted (support is support).
    Updates are left-multiplicative: T_cw <- exp(xi) T_cw (same convention as
    optimizer/ba.py, whose closed-form Jacobians this reuses).
    """
    K_intr = jnp.asarray(K_intr, jnp.float32)
    eye6 = jnp.eye(6, dtype=jnp.float32)
    prior_w = jnp.ones_like(mask, jnp.float32) if weights is None \
        else jnp.asarray(weights, jnp.float32)

    def residuals(T):
        r, Xc = _project_residual(T[None], X_w, uv, K_intr)
        ok = mask & (Xc[..., 2] > 0.1)
        return r, Xc, ok

    def step(T, _):
        r, Xc, ok = residuals(T)
        nrm = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)
        w = jnp.where(nrm <= huber_delta, 1.0, huber_delta / nrm)
        w = w * prior_w * ok.astype(r.dtype)
        J, _ = _jacobians(Xc, jnp.broadcast_to(T[:3, :3], Xc.shape + (3,)),
                          K_intr)                      # (N, 2, 6)
        wJ = w[:, None, None] * J
        H = jnp.einsum("nri,nrj->ij", wJ, J) + 1e-5 * eye6
        b = -jnp.einsum("nri,nr->i", wJ, r)
        dx = jnp.linalg.solve(H, b)
        # guard: a degenerate system (too few points) must not explode
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        return lie.se3_exp(dx) @ T, None

    T_fin, _ = jax.lax.scan(step, jnp.asarray(T_cw0, jnp.float32), None,
                            length=iters)
    r, _, ok = residuals(T_fin)
    nrm = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)
    inl = ok & (nrm < inlier_px)
    n = inl.sum()
    rmse = jnp.sqrt(jnp.sum(jnp.where(inl, nrm * nrm, 0.0))
                    / jnp.maximum(n, 1))
    return PnPResult(T_cw=T_fin, num_inliers=n.astype(jnp.int32), rmse=rmse)
