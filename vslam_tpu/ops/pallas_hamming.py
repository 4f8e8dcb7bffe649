"""Pallas TPU kernel: tiled XOR-popcount Hamming distance matrix.

The Pallas realization of the matching hot op (SURVEY.md §7 layer 3): packed
256-bit descriptors, distance(a, b) = popcount(a XOR b) summed over the 8
uint32 words. The kernel tiles (N1, N2) over a 2-D grid; each program
loads a (TILE_M, 8) x (TILE_N, 8) pair of descriptor blocks into VMEM and
emits a (TILE_M, TILE_N) int32 tile — the (N1, N2, 8) XOR intermediate that
a naive XLA formulation materializes in HBM never exists.

This is the VPU-integer counterpart of the MXU bit-plane matmul in
matching/hamming.py (d = |a| + |b| - 2 a·b over int8 planes); both are
exact. ``matcher.match`` dispatches on ``MatchingConfig.kernel``
("matmul" | "pallas" | "popcount"); ops/bench_kernels.py races the three on
hardware and the measured winner is the config default (KERNELS_r03.md:
the MXU matmul wins — 0.028 ms vs 0.203 ms here at 3072x3072, bit-exact
agreement; this kernel ran compiled on-chip in that race).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 256
TILE_N = 256


def hamming(desc1, desc2):
    """Kernel-dispatch entry used by matcher.match for cfg.kernel="pallas".

    Pads N1/N2 up to tile multiples (padded rows produce garbage distances
    that the caller's validity masks already exclude) and runs compiled on
    TPU, interpreted elsewhere (CPU tests).
    """
    n1 = desc1.shape[0]
    n2 = desc2.shape[0]
    p1 = (-n1) % TILE_M
    p2 = (-n2) % TILE_N
    d1 = jnp.pad(desc1, ((0, p1), (0, 0))) if p1 else desc1
    d2 = jnp.pad(desc2, ((0, p2), (0, 0))) if p2 else desc2
    fn = hamming_pallas if jax.default_backend() == "tpu" else \
        hamming_pallas_interpret
    D = fn(d1, d2)
    return D[:n1, :n2]


def _hamming_kernel(a_ref, b_ref, out_ref):
    """a_ref: (TILE_M, 8) uint32; b_ref: (TILE_N, 8) uint32;
    out_ref: (TILE_M, TILE_N) int32."""
    acc = jnp.zeros((TILE_M, TILE_N), jnp.int32)
    for w in range(8):
        aw = a_ref[:, w][:, None]            # (TILE_M, 1)
        bw = b_ref[:, w][None, :]            # (1, TILE_N)
        x = jax.lax.bitwise_xor(
            jax.lax.broadcast_in_dim(aw, (TILE_M, TILE_N), (0, 1)),
            jax.lax.broadcast_in_dim(bw, (TILE_M, TILE_N), (0, 1)),
        )
        acc = acc + jax.lax.population_count(x).astype(jnp.int32)
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=())
def hamming_pallas(desc1, desc2):
    """(N1, 8) x (N2, 8) packed uint32 -> (N1, N2) int32 Hamming distances.

    N1 and N2 must be multiples of the tile sizes (the framework's
    descriptor capacities are multiples of 256 by config convention).
    """
    n1, _ = desc1.shape
    n2, _ = desc2.shape
    assert n1 % TILE_M == 0 and n2 % TILE_N == 0, (n1, n2)

    grid = (n1 // TILE_M, n2 // TILE_N)
    return pl.pallas_call(
        _hamming_kernel,
        out_shape=jax.ShapeDtypeStruct((n1, n2), jnp.int32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE_M, 8), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_N, 8), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_M, TILE_N), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * 3 * n1 * n2,          # xor + popcount + add per word
            bytes_accessed=(n1 * 32 + n2 * 32) * (n1 // TILE_M) + n1 * n2 * 4,
            transcendentals=0,
        ),
    )(desc1, desc2)


def hamming_pallas_interpret(desc1, desc2):
    """Interpreter-mode variant for CPU tests."""
    n1, _ = desc1.shape
    n2, _ = desc2.shape
    grid = (n1 // TILE_M, n2 // TILE_N)
    return pl.pallas_call(
        _hamming_kernel,
        out_shape=jax.ShapeDtypeStruct((n1, n2), jnp.int32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE_M, 8), lambda i, j: (i, 0)),
                pl.BlockSpec((TILE_N, 8), lambda i, j: (j, 0)),
            ],
            out_specs=pl.BlockSpec((TILE_M, TILE_N), lambda i, j: (i, j)),
        ),
        interpret=True,
    )(desc1, desc2)
