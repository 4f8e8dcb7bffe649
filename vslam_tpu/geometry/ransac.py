"""Generic massively-parallel RANSAC on TPU.

This is the completed, TPU-native form of the reference's two unfinished /
serial robust estimators:

  * the 100-iteration serial hypothesize-and-verify loop
    (reference src/RansacFilter.cpp:36-67), and
  * the CUDA kernel sketch where each thread fits a model on one minimal
    sample and a tree reduction selects the best
    (reference src/ransac.cu:8-26 — non-compiling intent statement).

Design: the hypothesis count H is a *batch dimension*. Minimal samples are
drawn with a Gumbel top-k trick (vectorized sampling without replacement),
the model fit is ``vmap``-ed over H (thousands of 9x9 eigendecompositions in
one XLA op), verification is one (H, N) residual broadcast, and selection is
an argmax over inlier counts — the "tree reduction" of ransac.cu:20-24,
expressed as a single collective-friendly reduction. When a device mesh is
present, H shards across chips and the argmax rides ICI (see
parallel/sharded.py).

Scoring: inlier count with MSAC-style truncated-loss tie-breaking (lower
truncated residual sum wins among equal counts) — strictly better than the
reference's buggy tie-break that preferred *larger* residual sums
(src/RansacFilter.cpp:59).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class RansacResult(NamedTuple):
    model: jnp.ndarray        # best model parameters
    inliers: jnp.ndarray      # (N,) bool inlier mask for the best model
    num_inliers: jnp.ndarray  # () i32
    best_score: jnp.ndarray   # () f32 truncated residual sum of best model
    success: jnp.ndarray      # () bool


def sample_minimal_sets(key, weights, num_hypotheses: int, sample_size: int):
    """Draw (H, S) index sets over the valid entries.

    Vectorized equivalent of the reference's swap-and-pop Fisher-Yates
    sampler (src/RansacFilter.cpp:19-32), TPU-shaped: the valid indices are
    compacted once (one N-element sort), then each hypothesis draws S
    uniform positions into the compacted list. Within-set duplicates are
    possible but rare (p ≈ S²/2n); a duplicated row only degrades that one
    hypothesis's fit, which the inlier vote discards — far cheaper than the
    per-hypothesis Gumbel top-k (an (H, N) sort) that exact
    without-replacement sampling would cost.

    Args:
      key: PRNG key.
      weights: (N,) nonnegative sampling weights (0 excludes an index).
    Returns:
      (H, S) int32 indices (entries with weight 0 are never selected,
      provided at least one weight is positive).
    """
    n = weights.shape[0]
    valid = weights > 0
    n_valid = jnp.maximum(valid.sum().astype(jnp.int32), 1)
    # compact: valid indices first (stable argsort of the invalid flag)
    order = jnp.argsort(jnp.where(valid, 0, 1), stable=True).astype(jnp.int32)
    pos = jax.random.randint(key, (num_hypotheses, sample_size), 0, n_valid)
    return order[pos]


def ransac(
    key,
    fit_fn: Callable,
    residual_fn: Callable,
    data_fit,
    data_verify,
    valid_mask,
    num_hypotheses: int,
    sample_size: int,
    inlier_threshold: float,
    min_inliers: int = 8,
) -> RansacResult:
    """Generic batched hypothesize-and-verify.

    Args:
      fit_fn: pytree_of_(S,…)-samples -> model. Will be vmapped over H.
      residual_fn: (model, data_verify) -> (N,) squared residuals. vmapped.
      data_fit: pytree of (N, …) arrays gathered for minimal samples.
      data_verify: pytree passed whole to residual_fn.
      valid_mask: (N,) bool — which of the N rows are real data.
      inlier_threshold: squared-residual threshold.
    """
    n = valid_mask.shape[0]
    idx = sample_minimal_sets(
        key, valid_mask.astype(jnp.float32), num_hypotheses, sample_size
    )  # (H, S)

    samples = jax.tree_util.tree_map(lambda a: a[idx], data_fit)  # (H, S, …)
    models = jax.vmap(fit_fn)(samples)

    resid = jax.vmap(lambda m: residual_fn(m, data_verify))(models)  # (H, N)
    resid = jnp.where(valid_mask[None, :], resid, jnp.inf)
    inlier = resid <= inlier_threshold
    counts = inlier.sum(axis=1)  # (H,)
    # MSAC truncated loss (for tie-breaking and refinement quality signal)
    trunc = jnp.minimum(resid, inlier_threshold)
    trunc = jnp.where(jnp.isfinite(trunc), trunc, 0.0)
    score = trunc.sum(axis=1)

    # Select: max count, then min truncated score. Combine into one sort key:
    # the normalized score term is < 1, so it only breaks count ties.
    combined = counts.astype(jnp.float32) - score / (score.max() + 1.0)
    best = jnp.argmax(combined)

    best_model = jax.tree_util.tree_map(lambda m: m[best], models)
    best_inliers = inlier[best] & valid_mask
    num = best_inliers.sum().astype(jnp.int32)
    return RansacResult(
        model=best_model,
        inliers=best_inliers,
        num_inliers=num,
        best_score=score[best],
        success=num >= min_inliers,
    )


def ransac_fundamental(
    key,
    uv1,
    uv2,
    valid_mask,
    num_hypotheses: int = 2048,
    inlier_threshold: float = 2.0,
    min_inliers: int = 15,
    refine: bool = True,
) -> RansacResult:
    """RANSAC fundamental-matrix estimation over padded match arrays.

    The TPU replacement for RansacFilter::find_fundamental
    (reference src/RansacFilter.cpp:36-67).

    Args:
      uv1, uv2: (N, 2) matched pixel coordinates (padded).
      valid_mask: (N,) bool.
    """
    from . import epipolar

    def fit(sample):
        s1, s2 = sample
        return epipolar.fundamental_from_8pt(s1, s2)

    def residual(F, data):
        d1, d2 = data
        return epipolar.sampson_error(F, d1, d2)

    result = ransac(
        key,
        fit,
        residual,
        data_fit=(uv1, uv2),
        data_verify=(uv1, uv2),
        valid_mask=valid_mask,
        num_hypotheses=num_hypotheses,
        sample_size=8,
        inlier_threshold=inlier_threshold,
        min_inliers=min_inliers,
    )
    if refine:
        # One least-squares polish on all inliers (weighted 8-point): the
        # classical local-optimization step the reference lacks.
        w = result.inliers.astype(uv1.dtype)
        F = _weighted_eight_point(uv1, uv2, w)
        resid = epipolar.sampson_error(F, uv1, uv2)
        inl = (resid <= inlier_threshold) & valid_mask
        better = inl.sum() >= result.num_inliers
        F = jnp.where(better, F, result.model)
        inl = jnp.where(better, inl, result.inliers)
        result = result._replace(
            model=F, inliers=inl, num_inliers=inl.sum().astype(jnp.int32)
        )
    return result


class PoseRansacResult(NamedTuple):
    model: jnp.ndarray        # (3, 3) fundamental matrix of the winner
    R: jnp.ndarray            # (3, 3) rotation, x2 = R x1 + t
    t: jnp.ndarray            # (3,) unit translation
    inliers: jnp.ndarray      # (N,) bool — Sampson inliers in front of both cams
    num_inliers: jnp.ndarray  # () i32
    votes: jnp.ndarray        # (4,) cheirality votes of the winning hypothesis
    success: jnp.ndarray      # () bool


def ransac_pose(
    key,
    uv1,
    uv2,
    valid_mask,
    K,
    num_hypotheses: int = 2048,
    inlier_threshold: float = 2.0,
    min_inliers: int = 15,
    refine: bool = True,
    fit_sweeps: int = 4,
    vote_stride: int = 6,
) -> PoseRansacResult:
    """Relative-pose RANSAC with cheirality-aware model selection.

    Plain F-RANSAC scores hypotheses by Sampson-inlier count alone, which is
    treacherous under near-forward motion: a geometrically wrong F can cover
    one extra false match and win while triangulating points *behind* the
    cameras (measured: 59 deg translation error on a synthetic pair where the
    runner-up model had 0.6 deg). Here every hypothesis is decomposed to its
    four (R, t) candidates and scored by the number of Sampson inliers that
    are also in front of BOTH cameras — the physically meaningful consensus.
    All H x 4 candidate checks are branch-free elementwise work that XLA
    fuses into the vote reduction; no (H, 4, N) tensor is materialized.

    This is the completed, physically-grounded form of the reference's
    find_fundamental + extract_Rt pipeline (src/RansacFilter.cpp:36-67,
    src/helpers.cpp:3-35 — which picked R by a trace heuristic and forced
    t.z >= 0 instead of voting).
    """
    from . import epipolar

    idx = sample_minimal_sets(
        key, valid_mask.astype(jnp.float32), num_hypotheses, 8
    )  # (H, 8)
    # Low-sweep Jacobi for the hypothesis fits: a hypothesis only needs to
    # rank well; the winner is re-fit at full accuracy in the LO step.
    fit = lambda s1, s2: epipolar.fundamental_from_8pt(s1, s2,
                                                       sweeps=fit_sweeps)
    Fs = jax.vmap(fit)(uv1[idx], uv2[idx])                  # (H,3,3)

    resid = epipolar.sampson_error(Fs, uv1, uv2)            # (H, N)
    resid = jnp.where(valid_mask[None, :], resid, jnp.inf)
    samp_inl = resid <= inlier_threshold

    # 4-way decomposition + in-front votes for every hypothesis at once.
    # Voting uses a strided subsample of the matches: the (H, 4, N) depth
    # check dominates HBM traffic at full N, and a few hundred votes rank
    # candidates just as well. Full-N inliers are computed for the winner
    # only (below).
    Es = jnp.einsum("ji,hjk,kl->hil", K, Fs, K)             # K^T F K, (H,3,3)
    Rs, ts = jax.vmap(epipolar.decompose_essential)(Es)     # (H,4,3,3),(H,4,3)
    uv1s, uv2s = uv1[::vote_stride], uv2[::vote_stride]
    z1, z2 = epipolar.triangulate_midpoint_depths(K, Rs, ts, uv1s, uv2s)
    good = samp_inl[:, None, ::vote_stride] & (z1 > 0) & (z2 > 0)
    votes_s = good.sum(axis=2)                              # (H, 4) sampled
    counts = votes_s.max(axis=1)                            # (H,)
    cand = votes_s.argmax(axis=1)                           # (H,)

    # MSAC truncated loss for tie-breaking among equal counts.
    trunc = jnp.minimum(resid, inlier_threshold)
    trunc = jnp.where(jnp.isfinite(trunc), trunc, 0.0)
    score = trunc.sum(axis=1)
    combined = counts.astype(jnp.float32) - score / (score.max() + 1.0)
    best = jnp.argmax(combined)

    F = Fs[best]
    R = Rs[best, cand[best]]
    t = ts[best, cand[best]]
    # Winner only: full-N cheirality-consistent inlier set + full votes.
    z1f, z2f = epipolar.triangulate_midpoint_depths(
        K, Rs[best], ts[best], uv1, uv2)                    # (4, N)
    good_f = samp_inl[best][None, :] & (z1f > 0) & (z2f > 0)
    best_votes = good_f.sum(axis=1)                         # (4,)
    inl = good_f[cand[best]] & valid_mask
    num = inl.sum().astype(jnp.int32)

    if refine:
        # LO step 1: least-squares F on the physically-consistent consensus,
        # re-decomposed and re-voted; accept only if consensus grows.
        w = inl.astype(uv1.dtype)
        F2 = _weighted_eight_point(uv1, uv2, w)
        r2 = epipolar.sampson_error(F2, uv1, uv2)
        s2 = (r2 <= inlier_threshold) & valid_mask
        E2 = K.T @ F2 @ K
        R2c, t2c, v2 = epipolar.recover_pose(E2, K, uv1, uv2, s2)
        z1r, z2r = epipolar.triangulate_midpoint_depths(K, R2c, t2c, uv1, uv2)
        inl2 = s2 & (z1r > 0) & (z2r > 0)
        num2 = inl2.sum().astype(jnp.int32)
        better = num2 >= num
        R = jnp.where(better, R2c, R)
        t = jnp.where(better, t2c, t)
        inl = jnp.where(better, inl2, inl)
        best_votes = jnp.where(better, v2, best_votes)
        num = jnp.where(better, num2, num)

        # LO step 2: robust multi-start IRLS-LM on the essential manifold
        # (the linear 8-point estimate is far from the ML optimum for
        # near-forward motion; see epipolar.refine_pose_gn*). Pass the full
        # valid mask, not the frozen consensus: the refiner re-derives
        # robust weights per iteration, so true inliers the (possibly
        # wrong) winner missed are reclaimed and false ones down-weighted.
        R, t = epipolar.refine_pose_gn_multistart(
            R, t, K, uv1, uv2, valid_mask.astype(uv1.dtype))
        from ..core import lie
        E3 = lie.hat(t) @ R
        K_inv = jnp.linalg.inv(K)
        F = K_inv.T @ E3 @ K_inv
        F = F / (jnp.linalg.norm(F) + 1e-12)
        r3 = epipolar.sampson_error(F, uv1, uv2)
        s3 = (r3 <= inlier_threshold) & valid_mask
        z1g, z2g = epipolar.triangulate_midpoint_depths(K, R, t, uv1, uv2)
        inl = s3 & (z1g > 0) & (z2g > 0)
        num = inl.sum().astype(jnp.int32)

    return PoseRansacResult(
        model=F,
        R=R,
        t=t,
        inliers=inl,
        num_inliers=num,
        votes=best_votes,
        success=num >= min_inliers,
    )


def _weighted_eight_point(uv1, uv2, w):
    """Weighted least-squares F over all (masked) correspondences."""
    from . import epipolar

    from ..ops import jacobi

    mask = w > 0
    n1, T1 = epipolar.hartley_normalize(uv1, mask)
    n2, T2 = epipolar.hartley_normalize(uv2, mask)
    A = epipolar._constraint_rows(n1, n2) * w[:, None]
    F = jacobi.null_vector(A, sweeps=10).reshape(3, 3)
    F = jacobi.rank2_project(F, sweeps=8)
    F = T2.T @ F @ T1
    return F / (jnp.linalg.norm(F) + 1e-12)
