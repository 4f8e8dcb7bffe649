"""Pinhole camera projection utilities (batched, jit-safe).

Conventions (used consistently across the framework):
  * ``T_wc`` — camera-to-world pose (the "pose" chained by the reference at
    src/vslam.cpp:88). Column vectors; points transform as X_w = T_wc · X_c.
  * ``T_cw = inv(T_wc)`` — world-to-camera extrinsics.
  * Projection matrix P = K · T_cw[:3, :]  (3x4), applied to homogeneous
    world points: x ~ P · X  (the reference builds c1/c2 this way at
    src/vslam.cpp:123-125 but in *relative* coordinates; we are world-frame
    consistent so the persistent map is globally meaningful).
"""
from __future__ import annotations

import jax.numpy as jnp

from . import lie


def K_matrix(fx, fy, cx, cy, dtype=jnp.float32):
    return jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], dtype=dtype)


def projection_matrix(K, T_wc):
    """P = K [R_cw | t_cw] : (…,3,4)."""
    T_cw = lie.inv_T(T_wc)
    return jnp.einsum("ij,...jk->...ik", K, T_cw[..., :3, :])


def project(P, X_w):
    """Project world points through 3x4 P.

    Args:
      P: (…,3,4) projection matrix.
      X_w: (…,N,3) world points.
    Returns:
      uv: (…,N,2) pixel coords, depth-safe division.
      z:  (…,N) projective depth (third homogeneous coordinate).
    """
    Xh = jnp.concatenate([X_w, jnp.ones_like(X_w[..., :1])], axis=-1)
    x = jnp.einsum("...ij,...nj->...ni", P, Xh)  # (…,N,3)
    z = x[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    uv = x[..., :2] / safe_z[..., None]
    return uv, z


def project_camframe(K, X_c):
    """Project camera-frame points: (…,N,3) -> uv (…,N,2), z (…,N)."""
    x = jnp.einsum("ij,...nj->...ni", K, X_c)
    z = x[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    return x[..., :2] / safe_z[..., None], z


def backproject(K_inv, uv, depth):
    """Pixel + depth -> camera-frame 3D point."""
    ones = jnp.ones_like(uv[..., :1])
    rays = jnp.einsum("ij,...nj->...ni", K_inv, jnp.concatenate([uv, ones], -1))
    return rays * depth[..., None]


def in_image(uv, width, height, margin=0.0):
    """Frustum test used by map-point association (reference src/vslam.cpp:141-143)."""
    return (
        (uv[..., 0] >= margin)
        & (uv[..., 0] < width - margin)
        & (uv[..., 1] >= margin)
        & (uv[..., 1] < height - margin)
    )


def pixel_to_normalized(K_inv, uv):
    """Pixels -> normalized image coordinates (z=1 plane)."""
    ones = jnp.ones_like(uv[..., :1])
    x = jnp.einsum("ij,...nj->...ni", K_inv, jnp.concatenate([uv, ones], -1))
    return x[..., :2] / x[..., 2:3]
