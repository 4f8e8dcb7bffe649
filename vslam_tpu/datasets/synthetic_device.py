"""On-device synthetic frame rendering (JAX), for device-resident runs.

The host renderer (datasets/synthetic.py render_frame) is a Python loop of
patch splats — fine for tests, but streaming its frames to the TPU rides the
dev-tunnel transport (~70 KB/s measured, ops/bench_kernels.py), so a long
on-chip endurance run would be transport-bound, not compute-bound (VERDICT
r03 weak #5). This module renders the SAME scene model entirely on device:
project all landmarks, bilinear-resample each landmark's patch by its
subpixel offset (the same 4-tap scheme as the host renderer), and scatter
the patches into the frame.

Difference vs the host renderer: overlap handling. The host paints
far-to-near (painter's algorithm); XLA scatter applies colliding updates in
unspecified order, so overlapping patches here composite by ADDING their
deviation from the background (clipped to [0, 1]). Landmarks rarely overlap
at the densities used (tests assert exact agreement on non-overlapping
scenes), and an occasional corrupted patch only costs that track — the
pipeline's identity/quality gates absorb it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("width", "height"))
def render_frame_device(xyz, patches, K, T_wc, width: int, height: int,
                        background: float = 0.35):
    """Render one grayscale frame on device.

    Args:
      xyz: (P, 3) world landmarks.
      patches: (P, ps, ps) per-landmark texture in [0, 1].
      K: (3, 3) intrinsics; T_wc: (4, 4) camera-to-world pose.
    Returns: (H, W) float32 image in [0, 1].
    """
    P, ps, _ = patches.shape
    r = ps // 2
    T_cw = jnp.linalg.inv(T_wc)
    Xc = xyz @ T_cw[:3, :3].T + T_cw[:3, 3]
    z = Xc[:, 2]
    uvw = Xc @ K.T
    uv = uvw[:, :2] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)[:, None]

    vis = (
        (z > 0.2)
        & (uv[:, 0] >= r + 1) & (uv[:, 0] < width - r - 1)
        & (uv[:, 1] >= r + 1) & (uv[:, 1] < height - r - 1)
    )
    xi = jnp.floor(uv[:, 0]).astype(jnp.int32)
    yi = jnp.floor(uv[:, 1]).astype(jnp.int32)
    fx = (uv[:, 0] - xi)[:, None, None]
    fy = (uv[:, 1] - yi)[:, None, None]

    # subpixel placement: same bilinear 4-tap resample as the host renderer
    pp = jnp.pad(patches, ((0, 0), (1, 1), (1, 1)), mode="edge")
    shifted = (
        (1 - fy) * (1 - fx) * pp[:, 1:-1, 1:-1]
        + (1 - fy) * fx * pp[:, 1:-1, :-2]
        + fy * (1 - fx) * pp[:, :-2, 1:-1]
        + fy * fx * pp[:, :-2, :-2]
    )                                                     # (P, ps, ps)

    dy = jnp.arange(-r, r + 1)
    yy = yi[:, None, None] + dy[None, :, None]            # (P, ps, 1)
    xx = xi[:, None, None] + dy[None, None, :]            # (P, 1, ps)
    yy = jnp.broadcast_to(yy, (P, ps, ps))
    xx = jnp.broadcast_to(xx, (P, ps, ps))
    # invisible landmarks scatter out of bounds -> dropped
    yy = jnp.where(vis[:, None, None], yy, height)

    img = jnp.full((height, width), background, jnp.float32)
    img = img.at[yy, xx].add(shifted - background, mode="drop")
    return jnp.clip(img, 0.0, 1.0)
