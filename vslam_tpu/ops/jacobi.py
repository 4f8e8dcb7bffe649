"""Batched small symmetric eigendecomposition via cyclic Jacobi sweeps.

Why: the SLAM hot path needs thousands of tiny decompositions per frame —
9x9 normal matrices for vmapped 8-point fits (geometry/epipolar.py), 4x4 for
DLT triangulation, 3x3 for rank-2/essential projections. ``jnp.linalg.svd`` /
``eigh`` lower to general-purpose iterative algorithms that are slow for
small batched operands on TPU; a fixed-sweep cyclic Jacobi is branch-free,
fully unrolled, and runs as pure VPU elementwise work across the batch —
exactly the "batched small SVD" Pallas/XLA strategy SURVEY.md §7 lists as a
hard part.

Accuracy: quadratic convergence; SWEEPS=8 gives ~1e-6 off-diagonal residual
for well-scaled 9x9 f32 inputs. Inputs should be pre-scaled (e.g. Hartley
normalization) so entries are O(1).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("sweeps",))
def jacobi_eigh(A, sweeps: int = 8):
    """Symmetric eigendecomposition of (..., n, n), n small and static.

    Returns (eigvals (..., n) ascending, eigvecs (..., n, n) with columns as
    eigenvectors), like jnp.linalg.eigh.
    """
    n = A.shape[-1]
    dtype = A.dtype
    V = jnp.broadcast_to(jnp.eye(n, dtype=dtype), A.shape)

    def rotate(carry, pq):
        A, V = carry
        p, q = pq
        app = A[..., p, p]
        aqq = A[..., q, q]
        apq = A[..., p, q]
        # rotation angle: tan(2θ) = 2 apq / (app - aqq)
        diff = app - aqq
        theta = 0.5 * jnp.arctan2(2.0 * apq, diff)
        c = jnp.cos(theta)
        s = jnp.sin(theta)
        # skip (identity rotation) where already diagonal
        tiny = jnp.abs(apq) < 1e-30
        c = jnp.where(tiny, 1.0, c)
        s = jnp.where(tiny, 0.0, s)

        # apply Givens rotation J(p,q,θ) on both sides: A <- Jᵀ A J
        rp = A[..., p, :]
        rq = A[..., q, :]
        A = A.at[..., p, :].set(c[..., None] * rp + s[..., None] * rq)
        A = A.at[..., q, :].set(-s[..., None] * rp + c[..., None] * rq)
        cp = A[..., :, p]
        cq = A[..., :, q]
        A = A.at[..., :, p].set(c[..., None] * cp + s[..., None] * cq)
        A = A.at[..., :, q].set(-s[..., None] * cp + c[..., None] * cq)
        # force exact symmetry of the zeroed pair
        A = A.at[..., p, q].set(0.0)
        A = A.at[..., q, p].set(0.0)

        vp = V[..., :, p]
        vq = V[..., :, q]
        V = V.at[..., :, p].set(c[..., None] * vp + s[..., None] * vq)
        V = V.at[..., :, q].set(-s[..., None] * vp + c[..., None] * vq)
        return (A, V), None

    pairs = [(p, q) for p in range(n - 1) for q in range(p + 1, n)]

    def sweep(_, AV):
        for pq in pairs:
            AV, _ = rotate(AV, pq)
        return AV

    # sweep loop as fori_loop: one sweep's rotations unroll (static indices),
    # the outer loop stays rolled — keeps the XLA graph ~sweeps× smaller.
    A, V = jax.lax.fori_loop(0, sweeps, sweep, (A, V))

    evals = jnp.diagonal(A, axis1=-2, axis2=-1)
    order = jnp.argsort(evals, axis=-1)
    evals_sorted = jnp.take_along_axis(evals, order, axis=-1)
    V_sorted = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return evals_sorted, V_sorted


def smallest_eigvec(A, sweeps: int = 8):
    """Eigenvector of the smallest eigenvalue of symmetric (..., n, n)."""
    w, V = jacobi_eigh(A, sweeps=sweeps)
    return V[..., :, 0]


def rank2_project(F, sweeps: int = 8):
    """Nearest rank-2 matrix (Frobenius) to (..., 3, 3).

    Uses F(I - v3 v3ᵀ) = σ1 u1 v1ᵀ + σ2 u2 v2ᵀ where v3 is the right
    singular vector of the smallest singular value — no SVD of F needed,
    just a 3x3 symmetric eigendecomposition of FᵀF.
    """
    FtF = jnp.einsum("...ji,...jk->...ik", F, F)
    v3 = smallest_eigvec(FtF, sweeps=sweeps)                # (..., 3)
    proj = jnp.eye(3, dtype=F.dtype) - v3[..., :, None] * v3[..., None, :]
    return jnp.einsum("...ij,...jk->...ik", F, proj)


def svd3(E, sweeps: int = 10):
    """Full SVD of (..., 3, 3) built from one symmetric eigendecomposition.

    Returns (U, S, Vt) with S descending, U/V proper (det +1 not enforced —
    callers needing rotations fix signs). u_i = E v_i / σ_i for the two
    largest; u3 completes the basis by cross product (robust when σ3 ~ 0,
    the essential-matrix case).
    """
    EtE = jnp.einsum("...ji,...jk->...ik", E, E)
    w, V = jacobi_eigh(EtE, sweeps=sweeps)                  # ascending
    # descending singular values
    S = jnp.sqrt(jnp.maximum(w[..., ::-1], 0.0))            # (..., 3)
    Vd = V[..., :, ::-1]                                     # columns desc
    Ev = jnp.einsum("...ij,...jk->...ik", E, Vd)            # (..., 3, 3)
    u1 = Ev[..., :, 0] / jnp.maximum(S[..., 0:1], 1e-12)
    u2 = Ev[..., :, 1] / jnp.maximum(S[..., 1:2], 1e-12)
    # re-orthonormalize u2 against u1 (f32 safety), then complete
    u1 = u1 / (jnp.linalg.norm(u1, axis=-1, keepdims=True) + 1e-12)
    u2 = u2 - jnp.sum(u1 * u2, axis=-1, keepdims=True) * u1
    u2 = u2 / (jnp.linalg.norm(u2, axis=-1, keepdims=True) + 1e-12)
    # u3: from E v3 when σ3 is significant (sign matters for reconstruction);
    # orthonormal completion by cross product when σ3 ~ 0 (essential case)
    u3_cross = jnp.cross(u1, u2)
    Ev3 = Ev[..., :, 2]
    degen = S[..., 2] < 1e-6 * jnp.maximum(S[..., 0], 1e-12)
    sign = jnp.where(jnp.sum(u3_cross * Ev3, axis=-1) < 0, -1.0, 1.0)
    u3 = jnp.where(degen[..., None], u3_cross, sign[..., None] * u3_cross)
    U = jnp.stack([u1, u2, u3], axis=-1)
    return U, S, jnp.swapaxes(Vd, -1, -2)
