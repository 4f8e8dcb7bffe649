"""Pallas kernel correctness (interpreter mode on CPU; the on-hardware path
is exercised by bench_kernels.py on the TPU)."""
import numpy as np
import jax.numpy as jnp

from vslam_tpu.matching import hamming
from vslam_tpu.ops import pallas_hamming


def test_pallas_hamming_matches_oracle():
    rng = np.random.RandomState(0)
    d1 = jnp.asarray(rng.randint(0, 2 ** 32, (256, 8), dtype=np.uint32))
    d2 = jnp.asarray(rng.randint(0, 2 ** 32, (512, 8), dtype=np.uint32))
    want = np.asarray(hamming.hamming_popcount(d1, d2))
    got = np.asarray(pallas_hamming.hamming_pallas_interpret(d1, d2))
    np.testing.assert_array_equal(got, want)
