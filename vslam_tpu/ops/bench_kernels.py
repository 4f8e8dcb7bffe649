"""Kernel microbenchmarks: race the alternative formulations on hardware.

Run on a TPU:  python -m vslam_tpu.ops.bench_kernels
Prints ms per call and achieved fraction of the relevant roofline
(speed-of-light analysis per SURVEY.md §5 tracing notes).

Measured pairs:
  * Hamming (N1,N2) over 256-bit descriptors: MXU int8 bit-plane matmul
    (matching/hamming.py) vs Pallas XOR-popcount (ops/pallas_hamming.py)
    vs naive XLA popcount broadcast.
  * batched 9x9 symmetric eigendecomposition: fixed-sweep Jacobi
    (ops/jacobi.py) vs jnp.linalg.eigh.
"""
from __future__ import annotations

import time

import numpy as np


def _time(fn, *args, n=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0  # ms


def main():
    import jax
    import jax.numpy as jnp

    from ..matching import hamming
    from . import jacobi, pallas_hamming

    rng = np.random.RandomState(0)
    N1 = N2 = 3072
    d1 = jnp.asarray(rng.randint(0, 2 ** 32, (N1, 8), dtype=np.uint32))
    d2 = jnp.asarray(rng.randint(0, 2 ** 32, (N2, 8), dtype=np.uint32))

    mm = jax.jit(hamming.hamming_matmul)
    pc = jax.jit(hamming.hamming_popcount)
    pk = jax.jit(pallas_hamming.hamming_pallas)

    flops = 2.0 * N1 * N2 * 256          # int8 MAC count of the matmul form
    int8_peak = 394e12                    # v5e int8 TOPS (approx)
    for name, fn in [("matmul(int8 MXU)", mm), ("pallas xor-popcount", pk),
                     ("xla popcount bcast", pc)]:
        try:
            ms = _time(fn, d1, d2)
            frac = flops / (ms / 1e3) / int8_peak
            print(f"hamming {name:22s} {ms:8.3f} ms   {frac*100:5.1f}% of int8 peak")
        except Exception as e:
            print(f"hamming {name:22s} FAILED: {type(e).__name__}: {e}")

    # consistency
    a = np.asarray(mm(d1, d2))
    try:
        b = np.asarray(pk(d1, d2))
        assert (a == b).all(), "pallas kernel disagrees with matmul oracle"
        print("hamming agreement: OK")
    except Exception as e:
        print("hamming agreement check failed:", e)

    # batched 9x9 eigh
    H = 2048
    A8 = rng.randn(H, 8, 9).astype(np.float32)
    AtA = jnp.asarray(np.einsum("bij,bik->bjk", A8, A8))
    jac = jax.jit(lambda A: jacobi.jacobi_eigh(A, sweeps=8))
    lap = jax.jit(jnp.linalg.eigh)
    for name, fn in [("jacobi(8 sweeps)", jac), ("jnp.linalg.eigh", lap)]:
        try:
            ms = _time(fn, AtA)
            print(f"eigh9x9 {name:22s} {ms:8.3f} ms  ({H} batch)")
        except Exception as e:
            print(f"eigh9x9 {name:22s} FAILED: {type(e).__name__}")


if __name__ == "__main__":
    main()
