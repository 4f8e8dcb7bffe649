"""Data-parallel multi-sequence tracking: one SLAM instance per mesh slot.

The multi-sequence operating mode of BASELINE config 5 (concurrent KITTI
00+02+05): the whole tracker state pytree gains a leading batch axis that is
sharded across the mesh, so each device tracks its own sequence(s) — maps,
features, RANSAC batches and all — inside a single jitted SPMD program.
There is no cross-talk between sequences, so the partitioned program runs
collective-free at 100% scaling efficiency; cross-sequence global BA (which
does communicate) runs separately via parallel/sharded_ba.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import VSLAMConfig
from ..pipeline import tracker


def batched_bootstrap(imgs, cfg: VSLAMConfig, mesh: Mesh, axis_name: str,
                      seeds=None):
    """imgs: (S, H, W) — one first-frame per sequence. Returns batched state
    sharded over the mesh; each sequence gets its own PRNG key."""
    shard = NamedSharding(mesh, P(axis_name))
    imgs = jax.device_put(imgs, shard)
    fn = jax.jit(jax.vmap(lambda im: tracker.bootstrap(im, cfg)))
    state = fn(imgs)
    S = imgs.shape[0]
    if seeds is None:
        seeds = jnp.arange(S, dtype=jnp.uint32)
    keys = jax.vmap(jax.random.PRNGKey)(seeds)
    return state.replace(key=keys)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _batched_step(state, imgs, cfg: VSLAMConfig):
    return jax.vmap(lambda s, i: tracker.track_step(s, i, cfg))(state, imgs)


def batched_track_step(state, imgs, cfg: VSLAMConfig, mesh: Mesh,
                       axis_name: str):
    """One tracking step for S sequences at once.

    state: batched TrackerState (leading axis S, sharded); imgs: (S, H, W).
    """
    shard = NamedSharding(mesh, P(axis_name))
    imgs = jax.device_put(imgs, shard)
    return _batched_step(state, imgs, cfg)
