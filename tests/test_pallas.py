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


def test_pallas_entry_pads_nonmultiple_shapes():
    rng = np.random.RandomState(1)
    d1 = jnp.asarray(rng.randint(0, 2 ** 32, (100, 8), dtype=np.uint32))
    d2 = jnp.asarray(rng.randint(0, 2 ** 32, (300, 8), dtype=np.uint32))
    want = np.asarray(hamming.hamming_popcount(d1, d2))
    got = np.asarray(pallas_hamming.hamming(d1, d2))
    np.testing.assert_array_equal(got, want)


def test_matcher_kernel_dispatch_agrees():
    """MatchingConfig.kernel selects equivalent kernels (VERDICT weak #1)."""
    from vslam_tpu.config import MatchingConfig
    from vslam_tpu.matching import matcher

    rng = np.random.RandomState(2)
    n = 256
    d1 = jnp.asarray(rng.randint(0, 2 ** 32, (n, 8), dtype=np.uint32))
    d2 = jnp.asarray(rng.randint(0, 2 ** 32, (n, 8), dtype=np.uint32))
    m = jnp.asarray(rng.rand(n) > 0.1)
    results = {
        k: matcher.match(d1, m, d2, m, MatchingConfig(kernel=k))
        for k in ("matmul", "pallas", "popcount")
    }
    base = results["matmul"]
    for k in ("pallas", "popcount"):
        np.testing.assert_array_equal(np.asarray(results[k].idx2),
                                      np.asarray(base.idx2))
        np.testing.assert_array_equal(np.asarray(results[k].mask),
                                      np.asarray(base.mask))
        np.testing.assert_array_equal(np.asarray(results[k].distance),
                                      np.asarray(base.distance))
