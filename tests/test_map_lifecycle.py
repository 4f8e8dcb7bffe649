"""Map lifecycle: eviction, compaction, id remap, bounded-memory churn.

VERDICT round-1 item #2: slots must be reclaimable and inserts must keep
succeeding after capacity-worth of churn, with zero silent drops. (The
reference map only ever grows, src/PointMap.cpp:5-15.)
"""
import numpy as np
import pytest
import jax.numpy as jnp

from vslam_tpu.core.types import empty_map
from vslam_tpu.mapping import point_map


def _filled_map(c=64, k=2, n=40, seed=0):
    rng = np.random.RandomState(seed)
    m = empty_map(c, k)
    xyz = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    color = jnp.asarray(rng.rand(n, 3).astype(np.float32))
    desc = jnp.asarray(rng.randint(0, 2 ** 32, (n, 8), dtype=np.uint32))
    m = point_map.insert_points(m, xyz, color, desc, jnp.ones(n, bool))
    return m, np.asarray(xyz), np.asarray(desc)


def test_compact_packs_alive_and_remaps():
    m, xyz, desc = _filled_map(n=40)
    kill = np.zeros(64, bool)
    kill[:40:3] = True  # kill every 3rd of the 40 used slots
    m = m.replace(alive=m.alive & ~jnp.asarray(kill))
    m2, remap = point_map.compact(m)
    remap = np.asarray(remap)

    alive_old = ~kill[:40]
    assert int(m2.size) == alive_old.sum()
    # survivors keep their payloads at the remapped slot
    for old in np.nonzero(alive_old)[0]:
        new = remap[old]
        assert new >= 0
        np.testing.assert_allclose(np.asarray(m2.xyz)[new], xyz[old])
        np.testing.assert_array_equal(
            np.asarray(m2.desc)[new * m2.obs_slots], desc[old])
    # dead slots map to -1
    assert (remap[:40][kill[:40]] == -1).all()
    assert (remap[40:] == -1).all()
    # new occupancy is contiguous
    alive2 = np.asarray(m2.alive)
    assert alive2[: int(m2.size)].all() and not alive2[int(m2.size):].any()


def test_remap_ids_passthrough():
    remap = jnp.asarray(np.array([2, -1, 0, 1], np.int32))
    ids = jnp.asarray(np.array([0, 1, 2, 3, -1], np.int32))
    got = np.asarray(point_map.remap_ids(ids, remap))
    np.testing.assert_array_equal(got, [2, -1, 0, 1, -1])


def test_evict_lru_exact_count_and_oldest_first():
    m, _, _ = _filled_map(c=64, n=50)
    # ages 0..49 (slot i last seen at frame i)
    m = m.replace(last_seen=jnp.arange(64, dtype=jnp.int32))
    m2 = point_map.evict_lru(m, min_free=30)  # keep at most 34 alive
    alive = np.asarray(m2.alive)[:50]
    assert alive.sum() == 64 - 30
    # the evicted ones are exactly the oldest
    assert not alive[: 50 - alive.sum()].any()
    assert alive[50 - alive.sum():].all()


def test_evict_lru_noop_when_enough_free():
    m, _, _ = _filled_map(c=64, n=10)
    m2 = point_map.evict_lru(m, min_free=30)
    np.testing.assert_array_equal(np.asarray(m2.alive), np.asarray(m.alive))


def test_churn_inserts_survive_past_capacity():
    """Insert 8x capacity worth of points with periodic maintenance; every
    batch must land in full (no silent drops)."""
    C, B = 128, 32
    rng = np.random.RandomState(1)
    m = empty_map(C, 2)
    total_inserted = 0
    for step in range(32):  # 32 * 32 = 1024 = 8 * capacity
        xyz = jnp.asarray(rng.randn(B, 3).astype(np.float32))
        color = jnp.zeros((B, 3), jnp.float32)
        desc = jnp.asarray(rng.randint(0, 2 ** 32, (B, 8), dtype=np.uint32))
        before = int(m.size)
        m = point_map.insert_points(m, xyz, color, desc,
                                    jnp.ones(B, bool), frame_idx=step)
        assert int(m.size) - before == B, f"dropped inserts at step {step}"
        total_inserted += B
        if int(m.size) >= int(0.75 * C):
            m = point_map.evict_lru(m, min_free=C // 2)
            m, _ = point_map.compact(m)
    assert total_inserted == 1024
    assert int(m.size) <= C


@pytest.mark.slow
def test_slam_system_bounded_map_no_drops():
    """End-to-end: a tiny-capacity map forces maintenance mid-run; tracking
    keeps working, zero dropped inserts, map stays within capacity."""
    import dataclasses
    from vslam_tpu.config import MapConfig, small_config
    from vslam_tpu.datasets import synthetic
    from vslam_tpu.pipeline.slam import SLAMSystem

    # Capacity sized so maintenance triggers mid-run AND the no-drop
    # contract is satisfiable: the zero-drop guarantee requires the
    # maintenance headroom (max(cap//10, min(cap//2, max_keypoints)),
    # slam.py) to cover a worst-case single-frame insert burst. The
    # round-5 provisional tier inserts 20-40/frame on this dense scene
    # (the old capacity=64 left 32 slots of headroom and was sized to the
    # pre-provisional ~6/frame rate — it now drops by design, not by
    # bug). 512 gives headroom 256 = the keypoint budget (the true burst
    # bound) and still overflows within ~8 frames.
    cfg = small_config().replace(map=MapConfig(capacity=512, obs_per_point=4,
                                               block_size=32))
    K = cfg.camera.K()
    scene = synthetic.make_scene(num_points=3000, seed=3, extent=(40, 10, 80),
                                 z_min=5.0)
    poses = synthetic.make_trajectory(24, step=0.6, yaw_rate=0.01, seed=3)
    sys_ = SLAMSystem(cfg, enable_ba=False)
    infos = []
    for i in range(24):
        img = synthetic.render_frame(K, poses[i], scene,
                                     cfg.camera.width, cfg.camera.height)
        infos.append(sys_.process(img))

    assert sys_.maintenance_runs >= 1, "maintenance never triggered"
    assert sys_.dropped_inserts_total == 0, "silent insert drops"
    assert all(i["map_size"] <= 512 for i in infos[1:])   # within capacity
    # tracking survived the id remap
    assert all(i["success"] for i in infos[-5:])
    assert infos[-1]["num_inliers"] > 30
