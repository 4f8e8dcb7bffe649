"""RANSAC with the hypothesis axis sharded across a device mesh.

The multi-chip completion of the reference's CUDA sketch
(reference src/ransac.cu:8-26): every device fits and scores its own slice of
the hypothesis batch (data-parallel model fits), then a cross-device
arg-best reduction — all_gather of per-device best (count, score, model) over
ICI — selects the winner. Matches/masks are replicated (they are small:
(N, 2) pixel arrays).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..geometry import ransac as ransac_mod
from ..geometry.ransac import RansacResult


def ransac_fundamental_sharded(
    mesh: Mesh,
    axis_name: str,
    key,
    uv1,
    uv2,
    valid_mask,
    num_hypotheses: int = 2048,
    inlier_threshold: float = 2.0,
    min_inliers: int = 15,
) -> RansacResult:
    """Hypotheses split evenly across ``mesh``'s ``axis_name`` axis.

    num_hypotheses is the GLOBAL count; each device runs its share with an
    independent PRNG key, then the best model is selected globally.
    """
    n_dev = mesh.shape[axis_name]
    assert num_hypotheses % n_dev == 0
    local_h = num_hypotheses // n_dev
    keys = jax.random.split(key, n_dev)  # (n_dev, 2) — sharded along axis

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis_name), P(), P(), P()),
        out_specs=P(),
        check_vma=False,  # outputs ARE replicated (post all_gather/psum) but
                          # the static checker cannot prove it
    )
    def run(local_keys, uv1, uv2, mask):
        res = ransac_mod.ransac_fundamental(
            local_keys[0], uv1, uv2, mask,
            num_hypotheses=local_h,
            inlier_threshold=inlier_threshold,
            min_inliers=min_inliers,
            refine=False,
        )
        # global arg-best: gather per-device (count, score, model)
        counts = jax.lax.all_gather(res.num_inliers, axis_name)   # (n_dev,)
        scores = jax.lax.all_gather(res.best_score, axis_name)
        models = jax.lax.all_gather(res.model, axis_name)          # (n_dev,3,3)
        combined = counts.astype(jnp.float32) - scores / (scores.max() + 1.0)
        best = jnp.argmax(combined)
        F = models[best]
        # recompute inliers of the winning model (replicated, cheap)
        from ..geometry import epipolar
        resid = epipolar.sampson_error(F, uv1, uv2)
        inl = (resid <= inlier_threshold) & mask
        num = inl.sum().astype(jnp.int32)
        return RansacResult(
            model=F,
            inliers=inl,
            num_inliers=num,
            best_score=scores[best],
            success=num >= min_inliers,
        )

    result = run(keys, uv1, uv2, valid_mask)
    # final polish on all inliers (single-device, replicated inputs)
    w = result.inliers.astype(uv1.dtype)
    F = ransac_mod._weighted_eight_point(uv1, uv2, w)
    from ..geometry import epipolar
    resid = epipolar.sampson_error(F, uv1, uv2)
    inl = (resid <= inlier_threshold) & valid_mask
    better = inl.sum() >= result.num_inliers
    F = jnp.where(better, F, result.model)
    inl = jnp.where(better, inl, result.inliers)
    return result._replace(model=F, inliers=inl,
                           num_inliers=inl.sum().astype(jnp.int32))
