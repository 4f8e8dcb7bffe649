"""Distributed bundle adjustment: landmarks sharded across the mesh.

The design SURVEY.md §5/§7 calls for: the point-major BA problem
(optimizer/ba.py) is partitioned along its point axis — each device
eliminates its own landmarks (local H_pp inverses, local Schur products)
and contributes its camera-block Hessian to a psum'd reduced system; every
device then solves the identical small (6C, 6C) dense system and
back-substitutes its local landmarks. Communication per LM iteration is one
psum of (C,C,6,6) + (C,6) — camera-count-sized, independent of the number of
landmarks, which is what makes ≥80% scaling efficiency attainable.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import BAConfig
from ..optimizer import ba


def solve_sharded(mesh: Mesh, axis_name: str, problem: ba.BAProblem,
                  K_intr, cfg: BAConfig):
    """Distributed LM solve. The problem's point axis must be divisible by
    the mesh size. Returns (new_problem, BAStats) with point arrays sharded
    and camera arrays replicated."""
    n_dev = mesh.shape[axis_name]
    P_pts = problem.points.shape[0]
    assert P_pts % n_dev == 0, (P_pts, n_dev)

    cam_spec = ba.BAProblem(
        T_cw=P(), cam_fixed=P(), cam_mask=P(),
        points=P(axis_name), point_mask=P(axis_name),
        obs_cam=P(axis_name), obs_uv=P(axis_name), obs_mask=P(axis_name),
    )
    out_stats_spec = ba.BAStats(
        initial_cost=P(), final_cost=P(), accepted=P(), costs=P()
    )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(cam_spec, P()),
        out_specs=(cam_spec, out_stats_spec),
        check_vma=False,  # camera outputs replicated via psum; checker can't prove
    )
    def run(local_problem, K_local):
        return ba._solve_impl(local_problem, K_local, cfg, axis_name=axis_name)

    return run(problem, jnp.asarray(K_intr, jnp.float32))
