"""BA scaling benchmark (BASELINE metric 3): LM iterations/sec + scaling.

Writes BENCH_BA_r03.json. Run on the TPU for the single-chip number:

    python bench_ba.py            # real chip: iterations/sec + breakdown
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench_ba.py --cpu-mesh   # virtual-mesh parity

What is measured vs modeled (and why):

  * measured — single-chip LM iterations/sec on a BASELINE-config-3-sized
    problem (20 cameras, 8192 landmarks, 16 obs slots), via iteration-count
    differencing (t(2n)-t(n))/n so compile/dispatch/fetch cancel. Both Schur
    assemblies are raced (one-hot matmul vs blocked scatter-add — the r03
    optimization, optimizer/ba.py) and the winner is reported as the
    headline. The completed form of the reference's BA stub
    (src/optimzer.cpp:1-9).
  * measured — a per-stage breakdown of one LM iteration (GN+Schur assembly,
    dense camera solve, landmark back-substitution, cost evaluation) under
    the same differencing harness, so the scaling model's split into
    landmark-parallel vs replicated work is measured, not assumed.
  * measured — sharded-solver parity: solve_sharded on a 1/2/4/8-device
    virtual CPU mesh reproduces the single-device camera solution (the same
    check the test suite runs; this host has 2 cores, so virtual-mesh WALL
    CLOCK is meaningless and is not reported as scaling).
  * modeled — multi-chip scaling efficiency, from the measured breakdown.
    Per LM iteration the landmark-parallel fraction (Schur assembly, back-
    sub, cost — everything indexed by the sharded point axis) divides by n;
    the replicated fraction (dense (6C)^2 solve + LM epilogue) does not; the
    psum of the reduced system (C,C,6,6)+(C,6) f32 rides ICI at ~45 GB/s x 2
    links. Efficiency(n) = T(1) / (n * T(n)). The round-2 model divided the
    WHOLE iteration by n and then re-added the solve for n>1 only — biased
    toward 1.0 (VERDICT r02 weak #3); this split fixes that.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

ICI_BYTES_PER_S = 45e9          # v5e per-link ICI, one direction
PSUM_HOPS = 2.0                 # ring all-reduce moves ~2x payload per device


def _fetch(x):
    import jax
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def make_problem(n_cams=20, n_pts=8192, k_obs=16, noise_px=0.5, seed=0,
                 corridor=False):
    """``corridor=True`` anchors landmarks along the trajectory (KITTI-00
    shape: hundreds of cameras over a long path, each landmark visible
    from a local stretch) instead of a fixed box every camera sees."""
    import jax.numpy as jnp
    from vslam_tpu.datasets import synthetic
    from vslam_tpu.optimizer import ba

    rng = np.random.RandomState(seed)
    K = np.array([[718.856, 0, 607.19], [0, 718.856, 185.22], [0, 0, 1.0]],
                 np.float32)
    poses = synthetic.make_trajectory(n_cams, step=1.0, seed=seed)
    if corridor:
        scene = synthetic.make_corridor_scene(
            poses, num_points=n_pts, seed=seed, lateral=20.0, vertical=6.0,
            ahead=(4.0, 60.0))
    else:
        scene = synthetic.make_scene(num_points=n_pts, seed=seed,
                                     extent=(60, 15, 120), z_min=4.0)
    xyz = scene.xyz
    obs_cam = np.zeros((n_pts, k_obs), np.int32)
    obs_uv = np.zeros((n_pts, k_obs, 2), np.float32)
    obs_mask = np.zeros((n_pts, k_obs), bool)
    # vectorized visibility: project all points through all cameras
    for c in range(n_cams):
        T_cw = np.linalg.inv(poses[c])
        Xc = xyz @ T_cw[:3, :3].T + T_cw[:3, 3]
        uv = (Xc @ K.T)
        z = uv[:, 2]
        ok = z > 0.5
        uvp = uv[:, :2] / np.maximum(z[:, None], 1e-6)
        ok &= (uvp[:, 0] >= 0) & (uvp[:, 0] < 1248) \
            & (uvp[:, 1] >= 0) & (uvp[:, 1] < 384)
        slot = obs_mask.sum(1)
        can = ok & (slot < k_obs)
        idx = np.where(can)[0]
        obs_cam[idx, slot[idx]] = c
        obs_uv[idx, slot[idx]] = uvp[idx] + rng.randn(len(idx), 2) * noise_px
        obs_mask[idx, slot[idx]] = True

    cam_fixed = np.zeros(n_cams, bool)
    cam_fixed[0] = True
    T_cw_all = np.stack([np.linalg.inv(p) for p in poses]).astype(np.float32)
    # perturb initial state so LM has real work
    import jax.numpy as jnp
    from vslam_tpu.core import lie
    xi = rng.randn(n_cams, 6).astype(np.float32) * 0.01
    xi[0] = 0
    T0 = np.asarray(lie.se3_exp(jnp.asarray(xi))) @ T_cw_all
    pts0 = xyz + rng.randn(*xyz.shape).astype(np.float32) * 0.05
    problem = ba.BAProblem(
        T_cw=jnp.asarray(T0),
        cam_fixed=jnp.asarray(cam_fixed),
        cam_mask=jnp.ones(n_cams, bool),
        points=jnp.asarray(pts0),
        point_mask=jnp.asarray(obs_mask.sum(1) >= 2),
        obs_cam=jnp.asarray(obs_cam),
        obs_uv=jnp.asarray(obs_uv),
        obs_mask=jnp.asarray(obs_mask),
    )
    return problem, K


def measure_iters_per_sec(problem, K, assembly, base_iters=8):
    """Device seconds per LM iteration via iteration-count differencing."""
    import jax.numpy as jnp
    from vslam_tpu.config import BAConfig
    from vslam_tpu.optimizer import ba

    Kj = jnp.asarray(K)

    def run(iters, seed):
        cfg = BAConfig(iterations=iters, schur_assembly=assembly)
        # perturb so the transport's identical-execution replay cache misses
        p = problem.replace(points=problem.points + seed * 1e-6)
        out, stats = ba.solve(p, Kj, cfg)
        _fetch(stats.final_cost)
        return stats

    def timed(iters, seed):
        run(iters, 0)                     # compile + warm
        t0 = time.perf_counter()
        run(iters, seed)
        return time.perf_counter() - t0

    t_n = timed(base_iters, 1)
    t_2n = timed(2 * base_iters, 2)
    per_iter = max(t_2n - t_n, 1e-9) / base_iters
    stats = run(2 * base_iters, 3)
    return per_iter, stats


def measure_breakdown(problem, K, assembly):
    """Per-stage device ms of one LM iteration (scan-differencing harness).

    Splits the iteration into the landmark-parallel stages (divide by n
    under point-axis sharding) and the replicated stage (dense camera
    solve), feeding the corrected scaling model.
    """
    import jax
    import jax.numpy as jnp
    from vslam_tpu.config import BAConfig
    from vslam_tpu.optimizer import ba
    from vslam_tpu.ops.bench_kernels import _device_time

    Kj = jnp.asarray(K)
    cfg = BAConfig(schur_assembly=assembly)
    lam = jnp.float32(1e-3)
    eps = lambda i: i.astype(jnp.float32) * 1e-7

    def gn_schur(i):
        r, w, J_c, J_p, _ = ba._gn_quantities(
            problem.T_cw, problem.points + eps(i), problem, Kj,
            cfg.huber_delta)
        S, b, Hpp_inv, b_p, W_blk = ba._schur_reduce(
            r, w, J_c, J_p, problem, lam, assembly=assembly)
        return (S, b)

    # fixed pieces for the downstream stages
    r, w, J_c, J_p, _ = ba._gn_quantities(
        problem.T_cw, problem.points, problem, Kj, cfg.huber_delta)
    S, b, Hpp_inv, b_p, W_blk = jax.jit(
        lambda: ba._schur_reduce(r, w, J_c, J_p, problem, lam,
                                 assembly=assembly))()
    _fetch(S)
    C6 = S.shape[0]

    def dense_solve(i):
        bb = b + eps(i)
        L, low = jax.scipy.linalg.cho_factor(
            S + (1e-6 * jnp.trace(S) / C6) * jnp.eye(C6, dtype=S.dtype),
            lower=True)
        return jax.scipy.linalg.cho_solve((L, low), bb)

    dx_cam = jax.jit(dense_solve)(jnp.uint32(0))
    _fetch(dx_cam)

    def backsub(i):
        return ba._backsub(dx_cam + eps(i), Hpp_inv, b_p, W_blk, problem)

    def cost(i):
        p = problem.replace(points=problem.points + eps(i))
        return ba.compute_cost(p, Kj, cfg.huber_delta)

    stages = [("gn+schur_assembly", gn_schur, "parallel", 16),
              ("dense_camera_solve", dense_solve, "replicated", 64),
              ("landmark_backsub", backsub, "parallel", 64),
              ("cost_eval", cost, "parallel", 64)]
    out = []
    for name, fn, kind, n_iter in stages:
        ms = _device_time(fn, n_iter)
        out.append({"stage": name, "ms": round(ms, 4), "kind": kind})
        print(f"ba stage [{assembly}] {name:22s} {ms:8.3f} ms  ({kind})")
    return out


def parity_cpu_mesh(problem, K):
    import jax
    import jax.numpy as jnp
    from vslam_tpu.config import BAConfig
    from vslam_tpu.optimizer import ba
    from vslam_tpu.parallel import mesh as mesh_mod
    from vslam_tpu.parallel import sharded_ba

    cfg = BAConfig(iterations=6)
    Kj = jnp.asarray(K)
    ref, ref_stats = ba.solve(problem, Kj, cfg)
    rows = []
    for n in (1, 2, 4, 8):
        if jax.device_count() < n:
            break
        mesh = mesh_mod.make_mesh("shard", n)
        out, stats = sharded_ba.solve_sharded(mesh, "shard", problem, Kj, cfg)
        dT = float(jnp.abs(out.T_cw - ref.T_cw).max())
        rows.append({"devices": n, "max_Tcw_diff_vs_single": dT,
                     "final_cost": float(stats.final_cost)})
        assert dT < 1e-3, (n, dT)
    return {"single_final_cost": float(ref_stats.final_cost), "parity": rows}


def scaling_model(breakdown, n_cams):
    """Strong-scaling efficiency from the MEASURED stage split.

    T(n) = T_parallel / n + T_replicated + T_psum(n>1); the landmark-
    parallel fraction is the measured sum of point-axis stages, the
    replicated fraction is the measured dense solve (plus nothing else —
    the LM epilogue is element-wise on (C,) state, negligible and also
    replicated). Efficiency = T(1) / (n * T(n)).
    """
    t_par = sum(s["ms"] for s in breakdown if s["kind"] == "parallel") / 1e3
    t_rep = sum(s["ms"] for s in breakdown if s["kind"] == "replicated") / 1e3
    psum_bytes = (n_cams * n_cams * 36 + 6 * n_cams) * 4.0
    t_comm = PSUM_HOPS * psum_bytes / ICI_BYTES_PER_S
    t1 = t_par + t_rep
    rows = []
    for n in (1, 2, 4, 8, 16):
        t_n = t_par / n + t_rep + (t_comm if n > 1 else 0.0)
        rows.append({"devices": n,
                     "modeled_iters_per_sec": round(1.0 / t_n, 2),
                     "modeled_efficiency": round(t1 / (n * t_n), 4)})
    return {"measured_parallel_s": round(t_par, 6),
            "measured_replicated_s": round(t_rep, 6),
            "psum_bytes_per_iter": psum_bytes,
            "psum_s": t_comm,
            "ici_bytes_per_sec": ICI_BYTES_PER_S, "rows": rows}


def race_assemblies(problem, K, assemblies=("scatter", "onehot"),
                    base_iters=8):
    race = {}
    for assembly in assemblies:
        per_iter, stats = measure_iters_per_sec(problem, K, assembly,
                                                base_iters=base_iters)
        race[assembly] = {
            "sec_per_lm_iteration": round(per_iter, 6),
            "lm_iterations_per_sec": round(1.0 / per_iter, 2),
            "initial_cost": float(stats.initial_cost),
            "final_cost": float(stats.final_cost),
            "accepted_steps": int(np.asarray(stats.accepted).sum()),
        }
        print(f"assembly={assembly}: {per_iter * 1e3:.2f} ms/LM-iter "
              f"({1.0 / per_iter:.1f} it/s)", flush=True)
    return race


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-mesh", action="store_true",
                    help="virtual-mesh parity instead of chip timing")
    ap.add_argument("--out", default="BENCH_BA_r04.json")
    ap.add_argument("--skip-kitti-scale", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu_mesh:
        # the container's sitecustomize force-registers the TPU backend and
        # overrides JAX_PLATFORMS; this must be a config update
        jax.config.update("jax_platforms", "cpu")

    n_cams, n_pts, k_obs = 20, 8192, 16
    problem, K = make_problem(n_cams, n_pts, k_obs)
    result = {
        "problem": {"cams": n_cams, "points": n_pts, "obs_slots": k_obs},
        "backend": jax.default_backend(),
    }
    if args.cpu_mesh:
        result["cpu_mesh_parity"] = parity_cpu_mesh(problem, K)
        path = args.out.replace(".json", "_parity.json")
    else:
        race = race_assemblies(problem, K)
        result["assembly_race"] = race
        winner = min(race, key=lambda a: race[a]["sec_per_lm_iteration"])
        result["single_chip"] = dict(race[winner], assembly=winner)
        result["speedup_vs_scatter"] = round(
            race["scatter"]["sec_per_lm_iteration"]
            / race[winner]["sec_per_lm_iteration"], 2)
        result["breakdown"] = measure_breakdown(problem, K, winner)
        result["scaling_model"] = scaling_model(result["breakdown"], n_cams)

        if not args.skip_kitti_scale:
            # ---- KITTI-00-scale global BA (VERDICT r03 next #6): -------
            # hundreds of cameras, ~10^5 corridor landmarks, scatter
            # assembly past the one-hot threshold. BASELINE metric 3's
            # numerator at the scale the metric is about.
            gc, gp, gk = 256, 65536, 8
            gprob, gK = make_problem(gc, gp, gk, corridor=True, seed=1)
            import jax.numpy as jnp
            n_live = int(np.asarray(gprob.point_mask.sum()))
            n_obs = int(np.asarray(
                (gprob.obs_mask & gprob.point_mask[:, None]).sum()))
            print(f"kitti00-scale problem: {gc} cams, {n_live} live "
                  f"landmarks, {n_obs} observations", flush=True)
            grace = race_assemblies(gprob, gK, base_iters=4)
            gw = min(grace, key=lambda a: grace[a]["sec_per_lm_iteration"])
            gbreak = measure_breakdown(gprob, gK, gw)
            result["kitti00_scale"] = {
                "problem": {"cams": gc, "points": gp, "obs_slots": gk,
                            "live_landmarks": n_live, "observations": n_obs},
                "assembly_race": grace,
                "single_chip": dict(grace[gw], assembly=gw),
                "breakdown": gbreak,
                "scaling_model": scaling_model(gbreak, gc),
            }

            # ---- auto-switch threshold validation: race both assemblies
            # over the camera axis at fixed landmark load ----------------
            rows = []
            for c in (16, 32, 64, 128):
                p, pk = make_problem(c, 16384, 8, corridor=True, seed=2)
                r = race_assemblies(p, pk, base_iters=4)
                rows.append({
                    "cams": c,
                    "onehot_ms": r["onehot"]["sec_per_lm_iteration"] * 1e3,
                    "scatter_ms": r["scatter"]["sec_per_lm_iteration"] * 1e3,
                    "winner": min(r, key=lambda a:
                                  r[a]["sec_per_lm_iteration"]),
                })
                print(f"threshold race cams={c}: {rows[-1]}", flush=True)
            result["assembly_threshold_race"] = {
                "fixed_points": 16384, "obs_slots": 8, "rows": rows,
                "config_threshold_cams": 64,
            }
        path = args.out
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
