"""vslam_tpu — a TPU-native monocular feature-based SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
rahulaggarwal965/vslam (C++/OpenCV/Pangolin), designed TPU-first:

  * feature detection / description as batched convolution + top-k kernels
    (frontend/),
  * descriptor matching as MXU bit-plane matmuls and Pallas XOR-popcount
    kernels instead of brute-force CPU Hamming + KD-trees (matching/, ops/),
  * two-view geometry as massively parallel hypothesize-and-verify RANSAC —
    the completed form of the reference's unfinished ransac.cu (geometry/),
  * a functional fixed-capacity world map (mapping/),
  * Schur-complement Gauss-Newton/LM bundle adjustment — the completed form
    of the reference's optimzer.cpp stub (optimizer/),
  * multi-chip execution via jax.sharding meshes (parallel/).
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry (8-point, triangulation, BA) needs true f32 accumulation; the TPU
# default of bfloat16 matmul passes breaks pose estimation. Hot kernels that
# can tolerate lower precision (descriptor matmuls are int8; image convs) opt
# in locally via jax.default_matmul_precision context or explicit `precision=`.
_jax.config.update("jax_default_matmul_precision", "highest")

from .config import VSLAMConfig, small_config  # noqa: F401
