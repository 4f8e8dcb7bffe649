"""Sharding tests on the 8-device virtual CPU mesh: sharded RANSAC and
distributed BA must agree with their single-device counterparts."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vslam_tpu.config import BAConfig
from vslam_tpu.optimizer import ba
from vslam_tpu.parallel import mesh as mesh_mod
from vslam_tpu.parallel import sharded_ba, sharded_ransac
from tests.test_geometry import _two_view_setup
from tests.test_ba import _make_problem, K as BA_K


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, jax.devices()
    return mesh_mod.make_mesh("shard", 8)


class TestShardedRansac:
    def test_matches_quality_of_single_device(self, mesh8):
        K, T1, T2, uv1, uv2, vis, _, is_out = _two_view_setup(
            noise=0.3, outlier_frac=0.4
        )
        res = sharded_ransac.ransac_fundamental_sharded(
            mesh8, "shard", jax.random.PRNGKey(0),
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(vis),
            num_hypotheses=512,
        )
        assert bool(res.success)
        inl = np.asarray(res.inliers)
        true_inl = vis & ~is_out
        precision = (inl & true_inl).sum() / max(inl.sum(), 1)
        recall = (inl & true_inl).sum() / max(true_inl.sum(), 1)
        assert precision > 0.9, precision
        assert recall > 0.7, recall


class TestShardedBA:
    def test_matches_single_device_solution(self, mesh8):
        # 256 points divisible by 8
        problem, T_cw_true, xyz_true, seen = _make_problem(
            n_points=256, noise_px=0.3
        )
        cfg = BAConfig(iterations=8)
        ref, ref_stats = ba.solve(problem, jnp.asarray(BA_K), cfg)
        dist, dist_stats = sharded_ba.solve_sharded(
            mesh_mod.make_mesh("shard", 8), "shard", problem,
            jnp.asarray(BA_K), cfg,
        )
        # identical math => near-identical results (fp reduction order differs)
        np.testing.assert_allclose(
            float(dist_stats.final_cost), float(ref_stats.final_cost),
            rtol=0.05,
        )
        np.testing.assert_allclose(
            np.asarray(dist.T_cw), np.asarray(ref.T_cw), atol=5e-3
        )

    def test_converges_on_mesh(self, mesh8):
        problem, T_cw_true, xyz_true, seen = _make_problem(
            n_points=256, noise_px=0.3
        )
        solved, stats = sharded_ba.solve_sharded(
            mesh_mod.make_mesh("shard", 8), "shard", problem,
            jnp.asarray(BA_K), BAConfig(iterations=10),
        )
        assert float(stats.final_cost) < float(stats.initial_cost) * 0.1
        terr = np.linalg.norm(
            np.asarray(solved.T_cw)[:, :3, 3] - T_cw_true[:, :3, 3], axis=1
        )[2:]
        iterr = np.linalg.norm(
            np.asarray(problem.T_cw)[:, :3, 3] - T_cw_true[:, :3, 3], axis=1
        )[2:]
        assert terr.mean() < iterr.mean() * 0.3
