"""Checkpoint / resume for the SLAM state.

The reference has no persistence at all — its map dies with the process
(SURVEY.md §5; the only hook was a commented-out JSON matrix dump,
reference src/vslam.cpp:21). Here the entire system state — tracker pytree
(pose, features, map), keyframe store, trajectory — serializes to a single
npz (the pytrees are flat arrays by construction), enabling resume,
post-hoc BA, and trajectory export.
"""
from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p.name if hasattr(p, "name") else p.key
                           if hasattr(p, "key") else p.idx) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save_state(path: str, system) -> str:
    """Serialize a pipeline.slam.SLAMSystem to <path>.npz (+ .json meta)."""
    state_arrays, _ = _flatten_with_paths(system.state)
    kf_arrays, _ = _flatten_with_paths(system.kf_store)
    payload = {f"state/{k}": v for k, v in state_arrays.items()}
    payload.update({f"kf/{k}": v for k, v in kf_arrays.items()})
    payload["trajectory"] = np.stack(system.trajectory)
    np.savez_compressed(path if path.endswith(".npz") else path + ".npz",
                        **payload)
    meta = {
        "frame_idx": system.frame_idx,
        "kf_count": system._kf_count,
        "config": json.loads(system.cfg.to_json()),
    }
    meta_path = (path[:-4] if path.endswith(".npz") else path) + ".json"
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return path


def load_state(path: str, system) -> None:
    """Restore a SLAMSystem saved with save_state. The system must be built
    with the same config (shapes must match)."""
    npz = np.load(path if path.endswith(".npz") else path + ".npz")
    meta_path = (path[:-4] if path.endswith(".npz") else path) + ".json"
    with open(meta_path) as f:
        meta = json.load(f)

    from ..pipeline import keyframes, tracker

    if system.state is None:
        # build an empty state skeleton to obtain the treedef
        system.state = tracker.init_state(system.cfg)

    def _restore(prefix, tree):
        arrays, _ = _flatten_with_paths(tree)
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        flat_paths, _ = jax.tree_util.tree_flatten_with_path(tree)
        new_leaves = []
        for (path, leaf) in flat_paths:
            key = "/".join(str(p.name if hasattr(p, "name") else p.key
                               if hasattr(p, "key") else p.idx) for p in path)
            data = npz[f"{prefix}/{key}"]
            assert data.shape == np.asarray(leaf).shape, (
                key, data.shape, np.asarray(leaf).shape)
            new_leaves.append(jnp.asarray(data))
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    system.state = _restore("state", system.state)
    system.kf_store = _restore("kf", system.kf_store)
    system.trajectory = list(npz["trajectory"])
    system.frame_idx = int(meta["frame_idx"])
    system._kf_count = int(meta["kf_count"])
