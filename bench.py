"""Benchmark: steady-state SLAM tracking throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "frames_per_sec_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N/30.0}

Baseline note: the reference publishes no performance numbers anywhere
(BASELINE.md — README.md is two lines, no benchmarks/ dir, no timing code);
its display loop paces at cv::waitKey(15) (reference src/vslam.cpp:287),
i.e. real-time 30 fps video is the implied operating point. We therefore
report vs_baseline relative to 30 fps real-time tracking.

Workload: KITTI-shaped frames (1248x384), 3072 keypoints, 2048 RANSAC
hypotheses, 128k-point map with full search-by-projection association every
frame — the reference's workload-defining constants (BASELINE.md) with the
hypothesis count raised to TPU batch scale.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vslam_tpu.config import VSLAMConfig
    from vslam_tpu.datasets import synthetic
    from vslam_tpu.pipeline import tracker

    cfg = VSLAMConfig()
    K = cfg.camera.K()
    W, H = cfg.camera.width, cfg.camera.height

    import sys

    # Per-invocation seed: the device transport caches bit-identical
    # executions ACROSS processes, so a fixed seed would let a second bench
    # run replay the first run's results in ~1 ms. Fresh inputs every run.
    run_seed = int(time.time()) % 100000
    print(f"run_seed={run_seed}", file=__import__("sys").stderr)

    n_timed = 40
    n_frames = n_timed + 2
    scene = synthetic.make_scene(num_points=12000, seed=run_seed,
                                 extent=(80, 15, 160), z_min=5.0)
    poses = synthetic.make_trajectory(n_frames, step=1.0, seed=run_seed)
    frames_np = synthetic.render_sequence(K, poses, scene, W, H)

    state = tracker.bootstrap(jnp.asarray(frames_np[0]), cfg)
    np.asarray(state.pose)  # fetch = the only true barrier on this transport

    # Device-side loop: lax.scan over pre-loaded sequential frames so the
    # measurement is pure per-chip compute — host dispatch/transfer latency
    # (large over the dev-tunnel transport) never enters the timed region.
    # Sequential frames => the map grows and association runs over it, the
    # real steady-state workload.
    stacked = jnp.asarray(np.stack(frames_np[1:]))     # (n_timed+1, H, W)
    np.asarray(stacked[0, 0, :4])  # force the upload to complete

    @jax.jit
    def run_n(state, stacked):
        def body(s, i):
            s2, out = tracker.track_step(s, stacked[i], cfg)
            return s2, (out.num_inliers, out.success)
        idx = jnp.arange(n_timed)
        return jax.lax.scan(body, state, idx)

    # compile + warmup on a DIFFERENT sequence: the transport layer caches
    # results of bit-identical executions, so the timed run must see fresh
    # inputs (measured: identical-input replays return in ~1 ms).
    poses_w = synthetic.make_trajectory(n_frames, step=1.0, seed=run_seed + 1)
    warm_np = synthetic.render_sequence(K, poses_w, scene, W, H)
    warm = jnp.asarray(np.stack(warm_np[1:]))
    st, (inl, ok) = run_n(tracker.bootstrap(jnp.asarray(warm_np[0]), cfg), warm)
    np.asarray(inl)  # drain compile + warm compute

    # NOTE on barriers: on this transport jax.block_until_ready returns
    # BEFORE the device finishes (measured: 1 ms "wait" on a 10 s compute).
    # Fetching output bytes is the only true completion barrier, so the
    # timed region ends at np.asarray of a tiny per-frame output.
    t0 = time.perf_counter()
    st, (inl, ok) = run_n(state, stacked)
    inl = np.asarray(inl)  # (n_timed,) int32 — fetch waits for the compute
    dt = time.perf_counter() - t0
    fps = n_timed / dt

    # sanity: tracking genuinely worked across the sequence
    ok = np.asarray(ok)
    print(
        f"sanity: success={int(ok.sum())}/{n_timed} median_inliers="
        f"{int(np.median(inl))} final_map={int(np.asarray(st.map.size))}",
        file=sys.stderr,
    )
    assert ok.mean() > 0.8, ok
    assert np.median(inl) > 50, inl

    print(json.dumps({
        "metric": "frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
