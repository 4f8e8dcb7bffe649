"""Core pytree state containers.

Functional equivalents of the reference's mutable structs:
  * FrameFeatures  ≈ struct Frame        (reference include/Frame.h:11-27)
  * MapState       ≈ struct PointMap     (reference include/PointMap.h:10-21)
  * TwoViewResult  ≈ the locals of main's per-frame block (src/vslam.cpp:70-290)

Everything is a fixed-capacity padded array + validity mask so the whole SLAM
step compiles to a single static-shape XLA program.
"""
from __future__ import annotations

import flax.struct as struct
import jax.numpy as jnp


@struct.dataclass
class FrameFeatures:
    """Per-frame detection output (fixed capacity N = config.frontend.max_keypoints).

    Replaces Frame.points / Frame.descriptors / Frame.map_point_ids
    (reference include/Frame.h:20-23). The KD-tree member (Frame.h:24) has no
    equivalent: spatial queries are batched distance computations on TPU
    (see matching/projection.py).
    """
    uv: jnp.ndarray          # (N, 2) f32 pixel coords
    desc: jnp.ndarray        # (N, 8) uint32 packed 256-bit descriptors
    score: jnp.ndarray       # (N,) f32 detector response
    mask: jnp.ndarray        # (N,) bool — valid keypoint
    angle: jnp.ndarray       # (N,) f32 orientation (radians)

    @property
    def capacity(self) -> int:
        return self.uv.shape[-2]


@struct.dataclass
class TwoViewResult:
    """Output of the two-view tracker (match → RANSAC → E → R,t)."""
    matches: jnp.ndarray       # (M, 2) i32 indices (idx in frame1, idx in frame2)
    match_mask: jnp.ndarray    # (M,) bool — survived ratio test + RANSAC
    F: jnp.ndarray             # (3, 3) fundamental matrix
    E: jnp.ndarray             # (3, 3) essential matrix
    R: jnp.ndarray             # (3, 3) relative rotation (cam1 -> cam2 coords)
    t: jnp.ndarray             # (3,) unit-norm relative translation
    num_inliers: jnp.ndarray   # () i32
    success: jnp.ndarray       # () bool


@struct.dataclass
class MapState:
    """Persistent world map (functional version of reference PointMap).

    * xyz/color/alive — the point arrays (reference PointMap.h:13-17).
    * desc/desc_count — rolling archive of observation descriptors per point;
      supports the min-over-observations Hamming cost ``orb_distance``
      (reference src/PointMap.cpp:36-46) as a masked min-reduction.
    * size — insert cursor (functional version of PointMap::size with doubling
      growth, reference src/PointMap.cpp:5-15 — here capacity is static).
    """
    xyz: jnp.ndarray         # (C, 3) f32 world positions
    color: jnp.ndarray       # (C, 3) f32 RGB in [0,1]
    desc: jnp.ndarray        # (C, K, 8) uint32 observation descriptor archive
    desc_count: jnp.ndarray  # (C,) i32 observations recorded (may exceed K)
    alive: jnp.ndarray       # (C,) bool
    last_seen: jnp.ndarray   # (C,) i32 frame index of latest observation
    first_uv: jnp.ndarray    # (C, 2) f32 pixel of the landmark's FOUNDING
                             # observation (the inserting track's first obs)
    first_P: jnp.ndarray     # (C, 3, 4) f32 projection matrix at founding
    first_C: jnp.ndarray     # (C, 3) f32 camera center (world) at founding
                             # — together the map-held track memory: when a
                             # broken track re-binds to its landmark via
                             # association, the tracker restores its pending
                             # record from these, so parallax maturity (and
                             # provisional promotion) accumulates across
                             # detector misses instead of resetting per
                             # unbroken match segment (tracker step 9).
    conf: jnp.ndarray        # (C,) f32 — maturity confidence: the ray-span
                             # parallax (radians) of the landmark's last
                             # geometric estimate (insert / promotion /
                             # refine). PnP weights anchors by
                             # conf^2/(conf^2+conf0^2) — inverse
                             # depth-variance weighting (sigma_z ~
                             # noise/parallax), so freshly promoted
                             # minimal-span anchors inform the pose
                             # without dominating it.
    prov: jnp.ndarray        # (C,) bool — PROVISIONAL landmark: inserted
                             # below the full parallax-maturity gate so its
                             # depth is not yet trustworthy. Participates in
                             # association (track identity persists across
                             # detector misses) and in BA (which re-solves
                             # its position), but is excluded from PnP
                             # anchoring and from the scale-ratio estimate
                             # until promoted (tracker step 8b) at full
                             # parallax. Thickens the anchor supply without
                             # the depth-bias compounding that a globally
                             # lowered insertion gate reintroduces
                             # (tracker step 8 measurement note).
    size: jnp.ndarray        # () i32 insert cursor

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]


def empty_map(capacity: int, obs_slots: int) -> MapState:
    return MapState(
        xyz=jnp.zeros((capacity, 3), jnp.float32),
        color=jnp.zeros((capacity, 3), jnp.float32),
        desc=jnp.zeros((capacity, obs_slots, 8), jnp.uint32),
        desc_count=jnp.zeros((capacity,), jnp.int32),
        alive=jnp.zeros((capacity,), bool),
        last_seen=jnp.zeros((capacity,), jnp.int32),
        first_uv=jnp.zeros((capacity, 2), jnp.float32),
        first_P=jnp.zeros((capacity, 3, 4), jnp.float32),
        first_C=jnp.zeros((capacity, 3), jnp.float32),
        conf=jnp.zeros((capacity,), jnp.float32),
        prov=jnp.zeros((capacity,), bool),
        size=jnp.zeros((), jnp.int32),
    )


def empty_features(capacity: int) -> FrameFeatures:
    return FrameFeatures(
        uv=jnp.zeros((capacity, 2), jnp.float32),
        desc=jnp.zeros((capacity, 8), jnp.uint32),
        score=jnp.zeros((capacity,), jnp.float32),
        mask=jnp.zeros((capacity,), bool),
        angle=jnp.zeros((capacity,), jnp.float32),
    )
