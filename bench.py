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

    n_frames = 12
    scene = synthetic.make_scene(num_points=8000, seed=0,
                                 extent=(60, 15, 120), z_min=5.0)
    poses = synthetic.make_trajectory(n_frames, step=1.0, seed=0)
    frames_np = synthetic.render_sequence(K, poses, scene, W, H)
    frames = [jnp.asarray(f) for f in frames_np]
    for f in frames:
        f.block_until_ready()

    state = tracker.bootstrap(frames[0], cfg)
    jax.block_until_ready(state)

    # warmup / compile
    state, out = tracker.track_step(state, frames[1], cfg)
    jax.block_until_ready(out)
    t_compile_done = time.perf_counter()

    # steady state timing (cycle through pre-rendered frames)
    n_timed = 20
    t0 = time.perf_counter()
    for i in range(n_timed):
        state, out = tracker.track_step(
            state, frames[2 + (i % (n_frames - 2))], cfg
        )
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = n_timed / dt

    print(json.dumps({
        "metric": "frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
