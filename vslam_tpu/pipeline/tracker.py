"""The per-frame tracking step: the jitted heart of the SLAM pipeline.

Functional rebuild of the reference's inline main() loop body
(reference src/vslam.cpp:53-290): extract -> match -> RANSAC F -> E -> (R, t)
-> pose chain -> match-id propagation -> search-by-projection association ->
triangulation -> reprojection gate -> map insert. One ``track_step`` call is
one XLA program; the frame-to-frame loop stays on the host (inherently
sequential — frame t needs pose t-1; throughput comes from inside-frame
batch parallelism, SURVEY.md §7 "hard parts").

Improvements over the reference (deliberate, per SURVEY.md §7):
  * world-frame-consistent map (the reference triangulates every pair in the
    *previous camera's* frame and inserts those coordinates directly into the
    global map, src/vslam.cpp:123-125,186 — mixing frames);
  * monocular scale propagation from re-observed map points (the reference
    uses unit translation every step, src/helpers.cpp:12);
  * proper cheirality, triangulation gates, argmin association.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

import flax.struct as struct

from ..config import VSLAMConfig
from ..core import camera as cam
from ..core import lie
from ..core.types import FrameFeatures, MapState, empty_features, empty_map
from ..frontend.frame import extract_features
from ..geometry import pnp, ransac, triangulation
from ..mapping import point_map
from ..matching import matcher


@struct.dataclass
class TrackerState:
    pose: jnp.ndarray          # (4, 4) T_wc of the latest tracked frame
    prev: FrameFeatures        # features of the latest frame
    prev_map_id: jnp.ndarray   # (N,) i32 map point id per previous-frame kp
    map: MapState
    frame_idx: jnp.ndarray     # () i32
    scale: jnp.ndarray         # () f32 — running translation scale estimate
    key: jnp.ndarray           # PRNG key; per-frame keys fold in frame_idx
                               # inside the jit (no host-side split dispatch)
    vel: jnp.ndarray           # (4, 4) last successful relative motion
                               # T_{t-1 -> t} (world-chained); the
                               # constant-velocity motion model used to
                               # extrapolate through tracking failures


class TrackOutput(NamedTuple):
    pose: jnp.ndarray
    num_matches: jnp.ndarray
    num_inliers: jnp.ndarray
    num_cheirality: jnp.ndarray
    num_associated: jnp.ndarray
    num_new_points: jnp.ndarray
    num_dropped_inserts: jnp.ndarray  # inserts lost to a full map this frame
    map_size: jnp.ndarray
    map_alive: jnp.ndarray     # alive landmarks within the cursor
    scale: jnp.ndarray
    success: jnp.ndarray
    # per-match data for frame annotation (reference draws keypoints, match
    # lines and reprojected circles on the live window, src/vslam.cpp:90-230)
    uv1: jnp.ndarray           # (N, 2) prev-frame keypoint of each match row
    uv2: jnp.ndarray           # (N, 2) current-frame keypoint
    match_mask: jnp.ndarray    # (N,) RANSAC-inlier match rows
    kp_uv: jnp.ndarray         # (N, 2) current-frame keypoints
    kp_mask: jnp.ndarray       # (N,)


def init_state(cfg: VSLAMConfig, seed: int = 0) -> TrackerState:
    n = cfg.frontend.max_keypoints
    return TrackerState(
        pose=jnp.eye(4, dtype=jnp.float32),
        prev=empty_features(n),
        prev_map_id=jnp.full((n,), -1, jnp.int32),
        map=empty_map(cfg.map.capacity, cfg.map.obs_per_point),
        frame_idx=jnp.zeros((), jnp.int32),
        scale=jnp.ones((), jnp.float32),
        key=jax.random.PRNGKey(seed),
        vel=jnp.eye(4, dtype=jnp.float32),
    )


def _masked_median(x, mask, fallback):
    """Median of x where mask, else fallback. Static-shape via sort."""
    big = jnp.where(mask, x, jnp.inf)
    s = jnp.sort(big)
    n = mask.sum()
    mid = jnp.maximum(n - 1, 0) // 2
    med = s[jnp.clip(mid, 0, x.shape[0] - 1)]
    return jnp.where(n > 0, med, fallback)


@functools.partial(jax.jit, static_argnames=("cfg", "seed"))
def bootstrap(img, cfg: VSLAMConfig, seed: int = 0) -> TrackerState:
    """Initialize from the first frame (reference src/vslam.cpp:67-69)."""
    H, W = cfg.camera.height, cfg.camera.width
    feats = extract_features(img, cfg.frontend, H, W)
    st = init_state(cfg, seed)
    return st.replace(prev=feats, frame_idx=jnp.ones((), jnp.int32))


class MapOps(NamedTuple):
    """Map-operation interface the tracking step is written against.

    The default (single-device) binding forwards to mapping/point_map; the
    sharded binding (parallel/sharded_tracker.py) runs the same step INSIDE
    ``shard_map`` with the map's point axis split across a mesh — shard-local
    scatters/gathers plus explicit collectives — so a sharded run is
    bit-identical to the single-device run (every non-map stage executes the
    same replicated program per device).
    """
    observe: object          # (m, ids, desc, valid, frame) -> m
    associate: object        # (m, P2, uv, desc, free) -> AssociationResult
    gather_xyz: object       # (m, ids) -> (N, 3) rows (0 where id invalid)
    insert: object           # (m, xyz, color, desc, valid, frame) -> m
    cull: object             # (m, frame) -> m
    alive_count: object      # (m) -> () i32
    global_capacity: int     # total map capacity across all shards


def default_map_ops(cfg: VSLAMConfig, W: int, H: int) -> MapOps:
    return MapOps(
        observe=point_map.add_observations,
        associate=lambda m, P2, uv, desc, free: point_map.associate(
            m, P2, uv, desc, free, cfg.map, cfg.matching, W, H),
        gather_xyz=lambda m, ids: m.xyz[jnp.clip(ids, 0, m.capacity - 1)],
        insert=point_map.insert_points,
        cull=point_map.cull_stale,
        alive_count=lambda m: (
            m.alive & (jnp.arange(m.capacity) < m.size)).sum(),
        global_capacity=cfg.map.capacity,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "map_axis"))
def track_step(state: TrackerState, img, cfg: VSLAMConfig,
               mesh=None, map_axis: str = "map"):
    """Track one new frame. Returns (new_state, TrackOutput).

    The RANSAC key derives from state.key + frame index inside the jit —
    the host dispatches exactly one program per frame.

    With ``mesh`` (a jax.sharding.Mesh carrying ``map_axis``), the map's
    point axis lives sharded across the mesh — BASELINE config 4's
    operating mode: the whole step runs under ``shard_map``
    (parallel/sharded_tracker.py) with search-by-projection as shard-local
    scans + a cross-shard arg-best over ICI, and insert/observe/cull as
    shard-local scatters. Map capacity then scales with the mesh instead of
    one chip's HBM; trajectories are bit-identical across mesh sizes and
    match the unsharded compilation to f32 tolerance
    (tests/test_sharded_tracking.py).
    """
    if mesh is not None:
        from ..parallel import sharded_tracker
        return sharded_tracker.run_sharded(state, img, cfg, mesh, map_axis)
    H, W = cfg.camera.height, cfg.camera.width
    return _step_impl(state, img, cfg, default_map_ops(cfg, W, H))


def _step_impl(state: TrackerState, img, cfg: VSLAMConfig, ops: MapOps):
    """The tracking step body, parameterized over the map backend."""
    H, W = cfg.camera.height, cfg.camera.width
    K = jnp.asarray(cfg.camera.K())
    N = cfg.frontend.max_keypoints
    GC = ops.global_capacity
    key = jax.random.fold_in(state.key, state.frame_idx)

    # 1. features ---------------------------------------------------------
    feats = extract_features(img, cfg.frontend, H, W)

    # 2. frame-to-frame matching (reference src/Frame.cpp:82-105) ---------
    mres = matcher.match(
        state.prev.desc, state.prev.mask, feats.desc, feats.mask, cfg.matching
    )
    uv1 = state.prev.uv                       # (N, 2)
    uv2 = feats.uv[mres.idx2]                 # (N, 2) aligned by match
    m_valid = mres.mask

    # 3. robust F -> E -> (R, t), cheirality-aware selection ---------------
    rres = ransac.ransac_pose(
        key, uv1, uv2, m_valid, K,
        num_hypotheses=cfg.ransac.num_hypotheses,
        inlier_threshold=cfg.ransac.inlier_threshold,
        min_inliers=cfg.ransac.min_inliers,
    )
    R, t_unit, votes = rres.R, rres.t, rres.votes
    pose_ok = rres.success

    # 4. monocular scale from re-observed map points ----------------------
    # Triangulate inlier matches in the *previous camera frame* at unit
    # baseline, compare predicted depths of already-mapped points.
    P1_rel = jnp.concatenate([K, jnp.zeros((3, 1))], axis=1)
    P2_rel = K @ jnp.concatenate([R, t_unit[:, None]], axis=1)
    X_rel, w_rel = triangulation.triangulate_dlt(P1_rel, P2_rel, uv1, uv2)
    z_rel = X_rel[:, 2]
    # map-predicted depth of prev-frame keypoints that carry a map id
    pid_prev = state.prev_map_id
    has_map = (pid_prev >= 0) & rres.inliers
    Xm = ops.gather_xyz(state.map, pid_prev)
    T_cw_prev = lie.inv_T(state.pose)
    Xm_c = jnp.einsum("ij,nj->ni", T_cw_prev[:3, :3], Xm) + T_cw_prev[:3, 3]
    z_map = Xm_c[:, 2]
    ratio = z_map / jnp.maximum(z_rel, 1e-6)
    ratio_ok = has_map & (z_rel > 0.05) & (z_map > 0.05) & jnp.isfinite(ratio) \
        & (ratio > 1e-3) & (ratio < 1e3)
    # Long-run robustness (endurance regime): a median over a handful of
    # ratios is noise — hold the previous scale below 8 supports — and a
    # single bad frame must not step the scale by more than 2x (measured
    # failure mode: associations momentarily drop to zero at low feature
    # density and the raw median spiked 10x, wrecking the chain).
    n_ratio = ratio_ok.sum()
    med = _masked_median(ratio, ratio_ok, state.scale)
    scale = jnp.where(n_ratio >= 8, med, state.scale)
    scale = jnp.clip(scale, 0.5 * state.scale, 2.0 * state.scale)
    scale = jnp.clip(scale, 1e-3, 1e3)
    # First tracked pair defines world scale = 1.
    scale = jnp.where(state.frame_idx <= 1, 1.0, scale)

    # 5. pose chain (reference src/vslam.cpp:88, made convention-correct).
    # On failure: TRUE constant-velocity — extrapolate the last successful
    # relative motion (the reference crashes; holding the pose would park the
    # camera and blow up re-acquisition error after a blackout).
    T_c2c1 = lie.make_T(R, scale * t_unit)     # cam1 coords -> cam2 coords
    T_c1c2 = lie.inv_T(T_c2c1)                 # relative motion
    new_pose = state.pose @ T_c1c2
    new_pose = jnp.where(pose_ok, new_pose, state.pose @ state.vel)

    # 6. map-id propagation along matches (reference src/vslam.cpp:111-118)
    prop_src = jnp.where(m_valid & (pid_prev >= 0), pid_prev, -1)
    map_id2 = jnp.full((N,), -1, jnp.int32)
    tgt = jnp.where(prop_src >= 0, mres.idx2, N)   # N = drop
    map_id2 = map_id2.at[tgt].set(prop_src, mode="drop")
    # propagated points get a fresh observation descriptor recorded
    new_map = ops.observe(
        state.map, map_id2, feats.desc, map_id2 >= 0, state.frame_idx
    )

    # 7. search-by-projection association (reference src/vslam.cpp:129-161).
    # On a failed frame-to-frame pose, ``new_pose`` is the constant-velocity
    # extrapolation — the association below doubles as the relocalization
    # candidate search.
    P2 = cam.projection_matrix(K, new_pose)
    kp_free = feats.mask & (map_id2 < 0)
    assoc = ops.associate(new_map, P2, feats.uv, feats.desc, kp_free)

    # 7b. map-based relocalization: when RANSAC failed (blackout recovery,
    # low-texture frame), re-anchor the camera by pose-only GN on the
    # landmarks the extrapolated pose associated (geometry/pnp.py). The
    # reference has no recovery path at all (SURVEY.md §5).
    assoc_found = assoc.point_id >= 0
    X_assoc = ops.gather_xyz(new_map, assoc.point_id)

    def _try_reloc(_):
        pr = pnp.refine_pose(
            lie.inv_T(new_pose), X_assoc, feats.uv, assoc_found, K, iters=8,
            inlier_px=cfg.triangulation.reproj_threshold_sq ** 0.5 * 1.5)
        return pr.T_cw, pr.num_inliers

    # lax.cond: the GN refine only executes on failed frames — the success
    # path pays nothing for the recovery machinery
    T_reloc, n_reloc = jax.lax.cond(
        pose_ok, lambda _: (lie.inv_T(new_pose), jnp.int32(-1)),
        _try_reloc, None)
    reloc_ok = (~pose_ok) & (n_reloc >= cfg.ransac.min_inliers)
    new_pose = jnp.where(reloc_ok, lie.inv_T(T_reloc), new_pose)
    track_ok = pose_ok | reloc_ok

    assoc_ok = assoc_found & track_ok
    map_id2 = jnp.where(assoc_ok, assoc.point_id, map_id2)
    new_map = ops.observe(new_map, assoc.point_id, feats.desc,
                          assoc_ok, state.frame_idx)

    # 8. triangulate new world points (reference src/vslam.cpp:186-251) ----
    P1 = cam.projection_matrix(K, state.pose)
    X_w, w_abs = triangulation.triangulate_dlt(P1, P2, uv1, uv2)
    # per-match map id of the *target* keypoint after propagation/association
    tgt_map_id = map_id2[mres.idx2]
    fresh = rres.inliers & (tgt_map_id < 0) & pose_ok
    gate = triangulation.triangulation_gate(
        P1, P2, state.pose[:3, 3], new_pose[:3, 3], X_w, uv1, uv2, w_abs,
        reproj_threshold_sq=cfg.triangulation.reproj_threshold_sq,
        min_depth=cfg.triangulation.min_depth,
        max_depth=cfg.triangulation.max_depth,
    )
    insert = fresh & gate
    # color: sample the image at the keypoint (grayscale -> replicated RGB;
    # the reference samples BGR with a row/col swap bug, src/vslam.cpp:248)
    xi = jnp.clip(uv2[:, 0].astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(uv2[:, 1].astype(jnp.int32), 0, H - 1)
    gray = img[yi, xi]
    color = jnp.stack([gray, gray, gray], axis=1)
    desc2 = feats.desc[mres.idx2]
    new_map = ops.insert(new_map, X_w, color, desc2, insert, state.frame_idx)
    # retire uncorroborated stale landmarks (map hygiene; the reference's
    # map only ever grows)
    new_map = ops.cull(new_map, state.frame_idx)

    # newly inserted points: give the target keypoints their map ids
    offs = jnp.cumsum(insert.astype(jnp.int32)) - 1
    new_ids = jnp.where(insert, state.map.size + offs, -1)
    new_ids = jnp.where(new_ids < GC, new_ids, -1)
    tgt2 = jnp.where(insert & (new_ids >= 0), mres.idx2, N)
    map_id2 = map_id2.at[tgt2].set(new_ids, mode="drop")
    n_dropped = (insert & (state.map.size + offs >= GC)).sum()
    n_alive = ops.alive_count(new_map)

    out = TrackOutput(
        pose=new_pose,
        num_matches=m_valid.sum(),
        num_inliers=rres.num_inliers,
        num_cheirality=jnp.max(votes),
        num_associated=assoc_ok.sum(),
        num_new_points=insert.sum() - n_dropped,
        num_dropped_inserts=n_dropped,
        map_size=new_map.size,
        map_alive=n_alive,
        scale=scale,
        success=track_ok,
        uv1=uv1,
        uv2=uv2,
        match_mask=rres.inliers,
        kp_uv=feats.uv,
        kp_mask=feats.mask,
    )
    # motion model: the relative step actually taken this frame, updated only
    # on success (during failures the extrapolation keeps replaying it)
    new_vel = jnp.where(track_ok, lie.inv_T(state.pose) @ new_pose, state.vel)
    new_state = TrackerState(
        pose=new_pose,
        prev=feats,
        prev_map_id=map_id2,
        map=new_map,
        frame_idx=state.frame_idx + 1,
        scale=scale,
        key=state.key,
        vel=new_vel,
    )
    return new_state, out
