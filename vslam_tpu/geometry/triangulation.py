"""Batched DLT triangulation.

The reference triangulates with a per-match loop of 4x4 SVDs on the host
(reference src/helpers.cpp:37-80 — hot loop #2 in SURVEY.md §3.1). Here the
whole batch is one vmapped 4x4 symmetric eigendecomposition: build the (N,4,4)
normal matrices A^T A and take the eigenvector of the smallest eigenvalue.
No data-dependent control flow; degenerate rows are handled by masks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def triangulate_dlt(P1, P2, uv1, uv2):
    """Linear (DLT) triangulation for N correspondences.

    Args:
      P1, P2: (3, 4) projection matrices (world -> pixels), or (N, 3, 4)
        per-correspondence matrices (delayed-triangulation tracks, where
        every keypoint's first observation came from a different camera).
      uv1, uv2: (N, 2) pixel observations.
    Returns:
      X: (N, 3) world points (dehomogenized, safe division).
      w_abs: (N,) |homogeneous w| — near-zero means point at infinity.
    """
    # Rows: u*P[2]-P[0], v*P[2]-P[1] for each view (reference helpers.cpp:49-52)
    def rows(P, uv):
        u = uv[:, 0:1]
        v = uv[:, 1:2]
        if P.ndim == 3:
            r0 = u * P[:, 2, :] - P[:, 0, :]     # (N, 4)
            r1 = v * P[:, 2, :] - P[:, 1, :]
        else:
            r0 = u * P[2][None, :] - P[0][None, :]   # (N, 4)
            r1 = v * P[2][None, :] - P[1][None, :]
        return r0, r1

    a0, a1 = rows(P1, uv1)
    a2, a3 = rows(P2, uv2)
    A = jnp.stack([a0, a1, a2, a3], axis=1)  # (N, 4, 4)
    # Row normalization improves conditioning of the normal equations.
    A = A / (jnp.linalg.norm(A, axis=2, keepdims=True) + 1e-12)
    from ..ops import jacobi
    Xh = jacobi.null_vector(A, sweeps=7)     # (N, 4) null vector, RR-refined
    w = Xh[:, 3]
    w_safe = jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
    X = Xh[:, :3] / w_safe[:, None]
    return X, jnp.abs(w)


def reprojection_errors_sq(P, X, uv):
    """Squared pixel reprojection error of world points X through P.
    P may be (3, 4) shared or (N, 3, 4) per-point (track first views).
    (Reference computes this with two matmuls + a manual normalize loop,
    src/vslam.cpp:192-251.)"""
    Xh = jnp.concatenate([X, jnp.ones_like(X[:, :1])], axis=1)
    if P.ndim == 3:
        x = jnp.einsum("nij,nj->ni", P, Xh)   # (N, 3)
    else:
        x = Xh @ P.T                          # (N, 3)
    z = x[:, 2]
    safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    d = x[:, :2] / safe[:, None] - uv
    return jnp.sum(d * d, axis=1), z


def triangulation_gate(
    P1,
    P2,
    C1_w,
    C2_w,
    X,
    uv1,
    uv2,
    w_abs,
    reproj_threshold_sq: float = 4.0,
    min_depth: float = 0.1,
    max_depth: float = 500.0,
    min_parallax_cos: float = 0.999962,  # cos(0.5 deg)
):
    """Quality gate for newly triangulated points.

    The reference gates only on reprojection error <= 4 px^2
    (src/vslam.cpp:234-251); we add the standard positive-depth, depth-range,
    and parallax checks that keep degenerate points out of the map.

    Args:
      C1_w, C2_w: (3,) camera centers in world frame; C1_w/P1 may be (N, 3)
        and (N, 3, 4) per-point (delayed-triangulation tracks).
    Returns:
      (N,) bool mask.
    """
    e1, z1 = reprojection_errors_sq(P1, X, uv1)
    e2, z2 = reprojection_errors_sq(P2, X, uv2)
    ray1 = X - (C1_w if C1_w.ndim == 2 else C1_w[None, :])
    ray2 = X - C2_w[None, :]
    n1 = jnp.linalg.norm(ray1, axis=1)
    n2 = jnp.linalg.norm(ray2, axis=1)
    cos_par = jnp.sum(ray1 * ray2, axis=1) / jnp.maximum(n1 * n2, 1e-9)
    ok = (
        (e1 <= reproj_threshold_sq)
        & (e2 <= reproj_threshold_sq)
        & (z1 > min_depth) & (z1 < max_depth)
        & (z2 > min_depth) & (z2 < max_depth)
        & (cos_par < min_parallax_cos)
        & (w_abs > 1e-7)
    )
    return ok
