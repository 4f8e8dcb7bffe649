"""Full-system tests: tracking + keyframes + window BA on synthetic sequences."""
import numpy as np
import jax.numpy as jnp

from vslam_tpu.config import small_config
from vslam_tpu.datasets import synthetic
from vslam_tpu.pipeline import slam
from vslam_tpu.utils import evaluate

CFG = small_config()
K = CFG.camera.K()
W, H = CFG.camera.width, CFG.camera.height


def _run(num_frames=24, enable_ba=True, seed=2, yaw_rate=0.01):
    scene = synthetic.make_scene(num_points=700, seed=seed,
                                 extent=(14, 6, 45), z_min=6.0)
    poses = synthetic.make_trajectory(num_frames, step=0.6, yaw_rate=yaw_rate,
                                      seed=seed)
    frames = synthetic.render_sequence(K, poses, scene, W, H)
    sys_ = slam.SLAMSystem(CFG, enable_ba=enable_ba)
    infos = [sys_.process(frames[i]) for i in range(num_frames)]
    return sys_, infos, poses


def _kf_ate(sys_, gt):
    kf = sys_.keyframe_poses()
    kf_frames = np.asarray(sys_.kf_store.kf_frame)
    kf_frames = np.sort(kf_frames[kf_frames >= 0])
    rmse, _, _ = evaluate.ate_rmse(kf, gt[kf_frames].astype(np.float64))
    return rmse


class TestSLAMSystem:
    def test_tracks_with_ba(self):
        sys_, infos, gt = _run()
        assert all(i.get("success", True) for i in infos[1:])
        assert any(i["ran_ba"] for i in infos[1:]), "window BA never ran"
        est = sys_.poses()
        rmse, _, _ = evaluate.ate_rmse(est, gt.astype(np.float64))
        assert rmse < 0.5, rmse
        # BA actually reduced its cost
        st = sys_.last_ba_stats
        assert float(st.final_cost) < float(st.initial_cost)

    def test_ba_improves_keyframe_trajectory(self):
        sys_ba, _, gt = _run(enable_ba=True)
        sys_no, _, _ = _run(enable_ba=False)
        ate_ba = _kf_ate(sys_ba, gt)
        ate_no = _kf_ate(sys_no, gt)
        # Window BA must tighten the keyframe trajectory. The margin is
        # modest by design: PnP map tracking (tracker step 7b) + unbiased
        # delayed triangulation already hold the no-BA baseline near the
        # noise floor on 24 frames (measured ~0.11), so BA's headroom here
        # is small — its large wins are on long sequences (scale
        # consistency), asserted by the endurance artifact.
        assert ate_ba < ate_no, (ate_no, ate_ba)
        assert ate_ba < 0.15, ate_ba

    def test_keyframe_store_populated(self):
        sys_, infos, gt = _run(num_frames=12)
        kf = sys_.keyframe_poses()
        assert len(kf) >= 3
        snap = sys_.snapshot()
        assert snap["points"].shape[0] > 50
        assert snap["points"].shape[1] == 3

    def test_metrics_summary(self):
        sys_, infos, gt = _run(num_frames=8)
        s = sys_.metrics.summary()
        assert s["frames"] == 8
        assert s["fps"] > 0
