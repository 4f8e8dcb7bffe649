"""Per-stage device-time breakdown of the tracking step on real hardware.

Run on a TPU:  python -m vslam_tpu.ops.bench_stages
Times each pipeline stage (feature extraction, matching, RANSAC pose,
triangulation, search-by-projection association, map insert) in isolation
under the scan-differencing harness of ops/bench_kernels (see that module's
docstring for why: fetch barriers, on-device inputs, replay-cache dodging),
then the full fused ``track_step``. The committed output lives in
KERNELS_r03.md.

Every stage folds the loop index into its inputs so XLA cannot hoist the
body out of the timing scan (loop-invariant code motion).
"""
from __future__ import annotations

import numpy as np

from .bench_kernels import _device_time, _fetch


def main(map_size: int = 51200):
    import jax
    import jax.numpy as jnp

    from ..config import VSLAMConfig
    from ..core import camera as cam
    from ..core.types import empty_map
    from ..datasets import synthetic
    from ..frontend.frame import extract_features
    from ..geometry import pnp, ransac, triangulation
    from ..mapping import point_map
    from ..matching import matcher
    from ..pipeline import tracker

    cfg = VSLAMConfig()
    K = cfg.camera.K()
    Kj = jnp.asarray(K)
    W, H = cfg.camera.width, cfg.camera.height
    print(f"backend={jax.default_backend()} frame={W}x{H} "
          f"kp={cfg.frontend.max_keypoints} hyp={cfg.ransac.num_hypotheses} "
          f"map={map_size}")

    # ---- realistic inputs: a rendered synthetic pair + a populated map ----
    scene = synthetic.make_scene(num_points=8000, seed=0, extent=(60, 12, 120),
                                 z_min=5.0)
    poses = synthetic.make_trajectory(2, step=1.0, seed=0)
    f0, f1 = synthetic.render_sequence(K, poses, scene, W, H)
    img0 = jnp.asarray(f0)
    img1 = jnp.asarray(f1)
    feats0 = extract_features(img0, cfg.frontend, H, W)
    feats1 = extract_features(img1, cfg.frontend, H, W)
    mres = matcher.match(feats0.desc, feats0.mask, feats1.desc, feats1.mask,
                         cfg.matching)
    uv1, uv2 = feats0.uv, feats1.uv[mres.idx2]

    m = empty_map(cfg.map.capacity, cfg.map.obs_per_point)
    kk = jax.random.split(jax.random.PRNGKey(7), 2)
    xyz = jax.random.normal(kk[0], (map_size, 3)) * jnp.asarray([20., 8., 30.]) \
        + jnp.asarray([0., 0., 40.])
    desc = jax.random.bits(kk[1], (map_size, 8), jnp.uint32)
    m = point_map.insert_points(m, xyz, jnp.zeros((map_size, 3), jnp.float32),
                                desc, jnp.ones(map_size, bool))
    P1 = cam.projection_matrix(Kj, jnp.eye(4))
    T2 = jnp.asarray(poses[1])
    P2 = cam.projection_matrix(Kj, T2)
    key = jax.random.PRNGKey(0)
    _fetch(m.size)
    _fetch(mres.idx2)

    eps = lambda i: i.astype(jnp.float32) * 1e-7

    stages = [
        ("features (Shi-Tomasi+NMS+BRIEF)", 16,
         lambda i: extract_features(img1 + eps(i), cfg.frontend, H, W).desc),
        ("match (hamming+ratio+crosscheck)", 64,
         lambda i: matcher.match(feats0.desc ^ i, feats0.mask,
                                 feats1.desc, feats1.mask, cfg.matching).idx2),
        ("ransac_pose (2048 hyp, 8-pt+E+cheirality)", 8,
         lambda i: ransac.ransac_pose(
             jax.random.fold_in(key, i), uv1 + eps(i), uv2, mres.mask, Kj,
             num_hypotheses=cfg.ransac.num_hypotheses,
             inlier_threshold=cfg.ransac.inlier_threshold,
             min_inliers=cfg.ransac.min_inliers).R),
        ("triangulate_dlt (3072 pts)", 64,
         lambda i: triangulation.triangulate_dlt(P1, P2, uv1 + eps(i), uv2)[0]),
        (f"associate (map={map_size})", 16,
         lambda i: point_map.associate(
             m, P2, feats1.uv + eps(i), feats1.desc ^ i, feats1.mask,
             cfg.map, cfg.matching, W, H).point_id),
        ("insert+cull (map ops)", 64,
         # sum the mutated arrays, not just .size — returning only the
         # cursor lets XLA DCE every scatter (the r03 0.037 ms was a
         # DCE'd no-op program)
         lambda i: (lambda m2: m2.xyz.sum() + m2.alive.sum()
                    + m2.last_seen.sum())(
             point_map.cull_stale(
                 point_map.insert_points(
                     m, xyz[:3072] + eps(i)[None], jnp.zeros((3072, 3)),
                     desc[:3072] ^ i, jnp.ones(3072, bool)),
                 jnp.asarray(100, jnp.int32)))),
        ("observe (archive scatter)", 64,
         lambda i: point_map.add_observations(
             m, jnp.arange(3072, dtype=jnp.int32) * 4 + (i % 4).astype(jnp.int32),
             feats1.desc ^ i, feats1.mask,
             jnp.asarray(7, jnp.int32)).desc_count.sum()),
        ("pnp refine (8 GN iters, 3072 pts)", 16,
         lambda i: pnp.refine_pose(
             jnp.eye(4) + eps(i) * 0.0, xyz[:3072] + eps(i)[None],
             feats1.uv, feats1.mask, Kj, iters=8).T_cw),
    ]

    total = 0.0
    for name, n_iter, fn in stages:
        try:
            ms = _device_time(fn, n_iter)
            total += ms
            print(f"stage {name:45s} {ms:8.3f} ms")
        except Exception as e:
            print(f"stage {name:45s} FAILED: {type(e).__name__}: {e}")

    # ---- the fused full step, at the same live map size -------------------
    # Loop-CARRIED scan (state threads through, map mutates every step), the
    # same shape as the real pipeline and bench.py. An independent-iteration
    # scan (state reset per step) lets XLA hoist all map-derived work that
    # doesn't depend on the loop index — e.g. the 51k-point descriptor
    # unpack — and measures ~3x faster than any real run can go.
    import functools
    state = tracker.bootstrap(img0, cfg)
    state = state.replace(map=m)
    _fetch(state.map.size)

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_seq(offset, n):
        def body(s, i):
            s2, out = tracker.track_step(s, img1 + eps(i + offset), cfg)
            return s2, out.num_inliers
        st, inl = jax.lax.scan(body, state,
                               jnp.arange(n, dtype=jnp.uint32))
        # the FINAL STATE must be a program output: with only the inlier
        # counts live, XLA dead-code-eliminates the entire map pipeline
        # (association, insert, observe, cull, PnP — none of it feeds
        # num_inliers) and the "fused step" measures a tracker with no map
        # (measured: 5.8 ms/frame DCE'd vs 12.7 ms real at map=51k; the
        # r03 fused number 6.85 ms had this flaw — KERNELS_r04.md §2)
        return st, inl.sum()

    import time as _t

    def timed_seq(n, off):
        _fetch(run_seq(jnp.uint32(0), n)[1])
        t0 = _t.perf_counter()
        _fetch(run_seq(jnp.uint32(off), n)[1])
        return _t.perf_counter() - t0

    n0 = 8
    t_n = timed_seq(n0, 1)
    t_2n = timed_seq(2 * n0, 2)
    ms = max(t_2n - t_n, 1e-9) / n0 * 1000.0
    print(f"stage {'sum of isolated stages':45s} {total:8.3f} ms")
    print(f"stage {'full fused track_step (carried scan)':45s} {ms:8.3f} ms  "
          f" ({1000.0 / ms:.1f} fps/chip at map={map_size})")


if __name__ == "__main__":
    main()
