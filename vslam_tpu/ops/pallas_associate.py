"""Fused Pallas TPU kernel for search-by-projection association.

The map-association hot path (mapping/point_map.associate — the TPU rebuild
of the reference's projection loop, src/vslam.cpp:129-161) is, in its XLA
form, a scan over map blocks that materializes (B, N) pixel-gate and
Hamming-distance intermediates in HBM; this kernel keeps the whole per-block
pipeline in VMEM instead. The round-3 on-chip race (KERNELS_r03.md) found
the XLA path matches or beats this kernel at every measured map size —
0.38 ms vs 2.55 ms at map=4096, 3.73 vs 4.76 at 51200, and a tie at full
capacity 131072 (9.12 vs 8.94, ~23% of int8 peak both) — so
``MapConfig.kernel`` defaults to "xla" and this kernel remains the
selectable alternative (identical picks, 100% agreement in the race).

This kernel fuses the whole per-block pipeline in VMEM:

  grid = (N/BN, C/BM), i (map blocks) minor — the (1, BN) running best
  stays resident in VMEM across all map blocks of a keypoint tile.

  per program:
    unpack the block's packed descriptors (BM, 8) uint32 -> (BM, 256) int8
    MXU:  ab = bits_m @ bits_kT           (int8 x int8 -> int32)
    VPU:  d  = pop_m + pop_k - 2 ab, min over occupied archive slots
          gate by pixel radius (projected coords precomputed by XLA)
          column min + first-argmin -> (BN,) candidates
    accumulate lexicographic (distance, map id) into the output refs

  skipped entirely (predicated): blocks past the insert cursor, blocks where
  no (map point, keypoint) pair passes the radius gate, archive slots no
  point in the block occupies.

The (BM, BN) tile never exists in HBM; per-frame HBM traffic drops from
O(blocks x B x N) words to the packed descriptors + (N,) outputs.

Semantics are bit-identical to point_map.associate's XLA path: the winner
per keypoint is the lexicographic (min distance, min map id) candidate among
gated pairs, -1 when nothing beats hamming_max.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1 << 14


def _unpack_block(words):
    """(BM, 8) uint32 -> (BM, 256) int8 bit planes (order-consistent is all
    Hamming needs; any fixed bit permutation preserves distances — the kp
    side in associate_fused uses the matching word-major order).

    Built as an 8-way lane concatenation of (BM, 32) single-word planes:
    Mosaic cannot lower a (BM, 8, 32) -> (BM, 256) shape cast, but it can
    concatenate along lanes.
    """
    bm = words.shape[0]
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (bm, 32), 1)
    planes = [((words[:, w][:, None] >> shifts) & jnp.uint32(1))
              for w in range(8)]
    # bf16, not int8: Mosaic's tpu.matmul rejects integer operands ("Bad lhs
    # type"); {0,1} values and <=256-length dots are exact in bf16 x bf16
    # with f32 accumulation. Cast chain u32 -> i32 -> f32 -> bf16 (Mosaic
    # has no direct u32 -> bf16 cast).
    cat = jnp.concatenate(planes, axis=1)
    return cat.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)


def _kernel(size_ref, mu_ref, mv_ref, dcount_ref, mdesc_ref,
            kx_ref, ky_ref, kbits_ref, kpop_ref,
            best_d_ref, best_id_ref,
            *, bm: int, bn: int, n_slots: int, r_sq: float,
            hamming_max: int):
    i = pl.program_id(1)                       # map-block index (minor)

    @pl.when(i == 0)
    def _():
        best_d_ref[:, :] = jnp.full((1, bn), BIG, jnp.int32)
        best_id_ref[:, :] = jnp.full((1, bn), -1, jnp.int32)

    block_start = i * bm

    @pl.when(block_start < size_ref[0, 0])
    def _():
        mu = mu_ref[:, :]                      # (BM, 1) f32, -1e9 = invisible
        kx = kx_ref[:, :]                      # (1, BN) f32, 1e9 = not free
        du = mu - kx
        dv = mv_ref[:, :] - ky_ref[:, :]
        near = (du * du + dv * dv) <= r_sq     # (BM, BN)

        @pl.when(jnp.any(near))
        def _():
            kbits = kbits_ref[:, :]            # (256, BN) bf16
            kpop = kpop_ref[:, :]              # (1, BN) f32
            dcount = dcount_ref[:, :]          # (BM, 1) i32
            fBIG = jnp.float32(BIG)

            def slot_min(k, ham):
                words = mdesc_ref[:, k * 8:(k + 1) * 8]   # (BM, 8) uint32
                bits = _unpack_block(words)                # (BM, 256) bf16
                # precision=DEFAULT: the package-global "highest" matmul
                # precision would request contract_precision<fp32> on bf16
                # operands, which Mosaic rejects; the {0,1} dot is exact at
                # native bf16 MXU precision anyway.
                ab = jax.lax.dot_general(
                    bits, kbits,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )                                          # (BM, BN) exact
                pop_m = jnp.sum(bits.astype(jnp.float32), axis=1,
                                keepdims=True)
                d_k = pop_m + kpop - 2.0 * ab              # f32, exact ints
                return jnp.where(dcount > k, jnp.minimum(ham, d_k), ham)

            ham = slot_min(0, jnp.full((bm, bn), fBIG, jnp.float32))
            for k in range(1, n_slots):
                ham = jax.lax.cond(
                    jnp.any(dcount > k),
                    lambda h, kk=k: slot_min(kk, h),
                    lambda h: h,
                    ham,
                )

            gated = jnp.where(near & (ham < hamming_max), ham, fBIG)
            col_min = jnp.min(gated, axis=0, keepdims=True)    # (1, BN)
            rows = jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
            first = jnp.min(jnp.where(gated == col_min, rows, bm), axis=0,
                            keepdims=True)                     # (1, BN)
            ids = block_start + first

            cur_d = best_d_ref[:, :]
            cmin_i = col_min.astype(jnp.int32)
            take = cmin_i < cur_d              # strict: earlier block wins
            best_d_ref[:, :] = jnp.where(take, cmin_i, cur_d)
            best_id_ref[:, :] = jnp.where(take, ids, best_id_ref[:, :])


@functools.partial(
    jax.jit,
    static_argnames=("bm", "bn", "n_slots", "r_sq", "hamming_max",
                     "interpret"))
def associate_pallas_call(size, mu, mv, dcount, mdesc, kx, ky, kbits, kpop,
                          bm: int, bn: int, n_slots: int, r_sq: float,
                          hamming_max: int = BIG, interpret: bool = False):
    """Raw kernel invocation. All shapes pre-padded: C % bm == 0, N % bn == 0.

    Args:
      size: (1, 1) i32 insert cursor.
      mu, mv: (C, 1) f32 projected map-point pixels; -1e9 where invisible.
      dcount: (C, 1) i32 occupied archive slots.
      mdesc: (C, n_slots*8) uint32 packed descriptors.
      kx, ky: (1, N) f32 keypoint pixels; 1e9 where not free.
      kbits: (256, N) bf16 unpacked keypoint bit planes ({0,1} values).
      kpop: (1, N) f32 keypoint popcounts.
    Returns:
      best_d (1, N) i32, best_id (1, N) i32 (-1 = none).
    """
    C = mu.shape[0]
    N = kx.shape[1]
    assert C % bm == 0 and N % bn == 0, (C, bm, N, bn)
    grid = (N // bn, C // bm)                  # i (map blocks) minor

    kernel = functools.partial(_kernel, bm=bm, bn=bn, n_slots=n_slots,
                               r_sq=r_sq, hamming_max=hamming_max)
    flops = 2 * C * N * 256 * n_slots
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((1, N), jnp.int32),
                   jax.ShapeDtypeStruct((1, N), jnp.int32)),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((bm, 1), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, 1), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, 1), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, n_slots * 8), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((256, bn), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, bn), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(C * (n_slots * 32 + 12) * (N // bn) + N * 265),
            transcendentals=0,
        ),
        interpret=interpret,
    )(size.reshape(1, 1).astype(jnp.int32), mu, mv, dcount, mdesc,
      kx, ky, kbits, kpop)


def _pick_bm(C):
    for bm in (1024, 512, 256, 128):
        if C % bm == 0:
            return bm
    return 0


def _pick_bn(N):
    for bn in (512, 256, 128):
        if N % bn == 0:
            return bn
    return 0


def associate_fused(m, P, kp_uv, kp_desc, kp_free, map_cfg, match_cfg,
                    width: int, height: int, frame_idx=None,
                    interpret: bool = False):
    """Drop-in fused-kernel equivalent of point_map.associate's block scan.

    Returns (point_id (N,) i32, distance (N,) i32) with identical semantics
    (lexicographic (distance, id) winner, -1 / BIG when nothing passes the
    radius + hamming_max gates). Falls back to raising if the map capacity
    has no power-of-two tiling (config capacities are powers of two).

    With ``frame_idx`` given, the re-acquisition tier (MatchingConfig
    reacq_*; point_map.associate docstring) runs as a SECOND kernel pass
    restricted to recently-seen points (visibility mask folded into mu) at
    the tighter radius / looser hamming gate; the two per-tier lexicographic
    winners combine by packed (distance, id) min — identical to the XLA
    path's single-pass disjunction, because each pass already returns the
    (min d, min id) element of its candidate subset. Stale blocks fail the
    second pass's radius gate for every keypoint, so its matmuls are
    predicated away and the extra pass costs O(recent blocks) only.
    """
    from ..frontend.descriptors import unpack_bits

    C = m.capacity
    K = m.obs_slots
    N = kp_uv.shape[0]
    bm = _pick_bm(C)
    assert bm, f"capacity {C} not tileable"
    n_pad = 0 if _pick_bn(N) else (-N) % 128
    bn = _pick_bn(N + n_pad)
    assert bn, (N, n_pad)

    # ---- map side (XLA prep: cheap (C,)-shaped work) ----------------------
    Xh = jnp.concatenate([m.xyz, jnp.ones_like(m.xyz[:, :1])], axis=1)
    proj = Xh @ P.T                                        # (C, 3)
    z = proj[:, 2]
    safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = proj[:, 0] / safe
    v = proj[:, 1] / safe
    vis = m.alive & (z > 0.1) & (u >= 0) & (u < width) \
        & (v >= 0) & (v < height)
    mu = jnp.where(vis, u, -1e9).astype(jnp.float32)[:, None]
    mv = jnp.where(vis, v, 0.0).astype(jnp.float32)[:, None]
    dcount = m.desc_count.astype(jnp.int32)[:, None]
    mdesc = m.desc.reshape(C, K * 8)

    # ---- keypoint side ----------------------------------------------------
    kx = jnp.where(kp_free, kp_uv[:, 0], 1e9).astype(jnp.float32)
    ky = jnp.where(kp_free, kp_uv[:, 1], 0.0).astype(jnp.float32)
    kbits = unpack_bits(kp_desc)                           # (N, 256) int8
    kpop = jnp.sum(kbits.astype(jnp.int32), axis=1)
    kbits = kbits.astype(jnp.bfloat16)
    kpop = kpop.astype(jnp.float32)
    if n_pad:
        kx = jnp.pad(kx, (0, n_pad), constant_values=1e9)
        ky = jnp.pad(ky, (0, n_pad))
        kbits = jnp.pad(kbits, ((0, n_pad), (0, 0)))
        kpop = jnp.pad(kpop, (0, n_pad))

    best_d, best_id = associate_pallas_call(
        m.size, mu, mv, dcount, mdesc,
        kx[None, :], ky[None, :], kbits.T, kpop[None, :],
        bm=bm, bn=bn, n_slots=K,
        r_sq=float(match_cfg.search_radius) ** 2,
        hamming_max=int(match_cfg.hamming_max),
        interpret=interpret,
    )
    best_d = best_d[0, :N]
    best_id = best_id[0, :N]
    found = best_d < match_cfg.hamming_max
    if frame_idx is not None and match_cfg.reacq_max_age > 0:
        age = frame_idx - m.last_seen
        # age >= 1: only BROKEN tracks (see point_map.associate)
        recent = (age >= 1) & (age <= match_cfg.reacq_max_age)
        mu_rq = jnp.where(recent[:, None], mu, -1e9)
        d_rq, id_rq = associate_pallas_call(
            m.size, mu_rq, mv, dcount, mdesc,
            kx[None, :], ky[None, :], kbits.T, kpop[None, :],
            bm=bm, bn=bn, n_slots=K,
            r_sq=float(match_cfg.reacq_radius) ** 2,
            hamming_max=int(match_cfg.reacq_hamming_max),
            interpret=interpret,
        )
        d_rq = d_rq[0, :N]
        id_rq = id_rq[0, :N]
        found_rq = d_rq < match_cfg.reacq_hamming_max
        # packed lexicographic (distance, id) combine — ids < 2^18 per the
        # capacity bound asserted in point_map.associate
        k1 = jnp.where(found, best_d * (1 << 18) + best_id, 1 << 30)
        k2 = jnp.where(found_rq, d_rq * (1 << 18) + id_rq, 1 << 30)
        kmin = jnp.minimum(k1, k2)
        found = kmin < (1 << 30)
        best_d = jnp.where(found, kmin >> 18, 1 << 14)
        best_id = kmin & ((1 << 18) - 1)
    return jnp.where(found, best_id, -1), best_d
